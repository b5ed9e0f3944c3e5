"""FlatIndex (single-device and 8-way sharded) vs NumPy brute force."""

import numpy as np
import pytest

from image_search_engine_tpu.index.flat import FlatIndex
from image_search_engine_tpu.parallel.mesh import make_mesh

from tests.test_distances import brute_topk


@pytest.mark.parametrize("metric", ["l2", "ip", "cosine"])
def test_flat_index_single_device(rng, metric):
    x = rng.standard_normal((257, 32)).astype(np.float32)
    q = rng.standard_normal((5, 32)).astype(np.float32)
    idx = FlatIndex(metric).add(x)
    d, i = idx.search(q, 9)
    bd, bi = brute_topk(q, x, 9, metric)
    np.testing.assert_array_equal(i, bi)
    np.testing.assert_allclose(d, bd, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("metric", ["l2", "ip", "cosine"])
def test_flat_index_sharded_8dev(rng, metric):
    mesh = make_mesh(8)
    # 203 rows: not divisible by 8 -> exercises pad-row poisoning
    x = rng.standard_normal((203, 24)).astype(np.float32)
    q = rng.standard_normal((6, 24)).astype(np.float32)
    idx = FlatIndex(metric, mesh=mesh).add(x)
    d, i = idx.search(q, 11)
    assert i.max() < 203, "padding row leaked into results"
    bd, bi = brute_topk(q, x, 11, metric)
    np.testing.assert_array_equal(i, bi)
    np.testing.assert_allclose(d, bd, rtol=1e-4, atol=1e-4)


def test_flat_index_sharded_matches_unsharded(rng):
    mesh = make_mesh(8)
    x = rng.standard_normal((512, 16)).astype(np.float32)
    q = rng.standard_normal((3, 16)).astype(np.float32)
    d1, i1 = FlatIndex("l2").add(x).search(q, 5)
    d2, i2 = FlatIndex("l2", mesh=mesh).add(x).search(q, 5)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(d1, d2, rtol=1e-4, atol=1e-4)


def test_flat_index_save_load_roundtrip(rng, tmp_path):
    x = rng.standard_normal((50, 8)).astype(np.float32)
    q = rng.standard_normal((2, 8)).astype(np.float32)
    idx = FlatIndex("cosine").add(x)
    p = tmp_path / "flat.npz"
    idx.save(p)
    idx2 = FlatIndex.load(p)
    d1, i1 = idx.search(q, 4)
    d2, i2 = idx2.search(q, 4)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(d1, d2, rtol=1e-5)


def test_flat_index_incremental_add(rng):
    x1 = rng.standard_normal((30, 8)).astype(np.float32)
    x2 = rng.standard_normal((20, 8)).astype(np.float32)
    idx = FlatIndex("l2").add(x1).add(x2)
    assert idx.ntotal == 50
    q = x2[:1]
    d, i = idx.search(q, 1)
    assert i[0, 0] == 30  # first row of the second batch
    assert d[0, 0] < 1e-6


def test_flat_index_k_larger_than_corpus(rng):
    x = rng.standard_normal((5, 4)).astype(np.float32)
    idx = FlatIndex("l2").add(x)
    d, i = idx.search(x[:1], 5)
    assert i.shape == (1, 5)


def test_sharded_search_k_exceeds_rows_per_shard(rng):
    # review finding: k > rows_per_shard must not crash (clamped per shard)
    mesh = make_mesh(8)
    x = rng.standard_normal((40, 32)).astype(np.float32)  # 5 rows/shard
    q = rng.standard_normal((2, 32)).astype(np.float32)
    idx = FlatIndex("l2", mesh=mesh).add(x)
    d, i = idx.search(q, 10, use_pallas=False)
    bd, bi = brute_topk(q, x, 10, "l2")
    np.testing.assert_array_equal(i, bi)


def test_k_exceeds_ntotal_pads_with_minus_one(rng):
    # review finding: no padding-row leakage; Faiss (-1, inf) tail instead
    x = rng.standard_normal((5, 8)).astype(np.float32)
    q = rng.standard_normal((2, 8)).astype(np.float32)
    d, i = FlatIndex("l2").add(x).search(q, 8)
    assert i.shape == (2, 8)
    assert (i[:, :5] < 5).all() and (i[:, :5] >= 0).all()
    assert (i[:, 5:] == -1).all()
    assert np.isinf(d[:, 5:]).all()


@pytest.mark.parametrize("dtype", ["bf16", "int8"])
@pytest.mark.parametrize("metric", ["l2", "ip", "cosine"])
def test_flat_index_reduced_precision_store(rng, dtype, metric):
    x = rng.standard_normal((300, 32)).astype(np.float32)
    q = rng.standard_normal((6, 32)).astype(np.float32)
    idx = FlatIndex(metric, dtype=dtype).add(x)
    d, i = idx.search(q, 10)
    bd, bi = brute_topk(q, x, 10, metric)
    i, bi = np.asarray(i), np.asarray(bi)
    recall = np.mean([len(set(a) & set(b)) / 10 for a, b in zip(i.tolist(), bi.tolist())])
    assert recall >= 0.9, (dtype, metric, recall)
    np.testing.assert_allclose(np.sort(d, 1), np.sort(bd, 1), rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("dtype", ["bf16", "int8"])
def test_flat_index_reduced_precision_sharded(rng, dtype):
    mesh = make_mesh(8)
    x = rng.standard_normal((203, 24)).astype(np.float32)
    q = rng.standard_normal((4, 24)).astype(np.float32)
    d1, i1 = FlatIndex("l2", dtype=dtype).add(x).search(q, 7)
    d2, i2 = FlatIndex("l2", mesh=mesh, dtype=dtype).add(x).search(q, 7)
    assert np.asarray(i2).max() < 203
    # same store values scored: sharded must equal unsharded exactly
    np.testing.assert_array_equal(np.sort(i1, 1), np.sort(i2, 1))
    np.testing.assert_allclose(np.sort(d1, 1), np.sort(d2, 1), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("dtype", ["bf16", "int8"])
def test_flat_index_reduced_precision_save_load(rng, tmp_path, dtype):
    x = rng.standard_normal((60, 16)).astype(np.float32)
    q = rng.standard_normal((3, 16)).astype(np.float32)
    idx = FlatIndex("l2", dtype=dtype).add(x)
    p = tmp_path / f"flat_{dtype}.npz"
    idx.save(p)
    idx2 = FlatIndex.load(p)
    assert idx2.dtype == dtype
    # round-trip is lossless over the store values: identical results
    d1, i1 = idx.search(q, 5)
    d2, i2 = idx2.search(q, 5)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(d1, d2, rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("metric", ["l2", "ip"])
def test_flat_index_sharded_pallas_path(rng, metric):
    # the real multi-chip serving path: fused Pallas kernel per shard
    # (interpret mode on the virtual mesh) + all_gather merge
    mesh = make_mesh(8)
    x = rng.standard_normal((203, 24)).astype(np.float32)
    q = rng.standard_normal((4, 24)).astype(np.float32)
    d1, i1 = FlatIndex(metric).add(x).search(q, 7, use_pallas=True)
    d2, i2 = FlatIndex(metric, mesh=mesh).add(x).search(q, 7, use_pallas=True)
    assert np.asarray(i2).max() < 203
    np.testing.assert_array_equal(np.sort(i1, 1), np.sort(i2, 1))
    np.testing.assert_allclose(np.sort(d1, 1), np.sort(d2, 1), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("dtype", ["bf16", "int8"])
def test_flat_index_sharded_pallas_reduced_precision(rng, dtype):
    # fused Pallas kernel per shard over a reduced-precision store
    # (interpret mode): must agree with the unsharded pallas path exactly
    mesh = make_mesh(8)
    x = rng.standard_normal((203, 24)).astype(np.float32)
    q = rng.standard_normal((4, 24)).astype(np.float32)
    d1, i1 = FlatIndex("l2", dtype=dtype).add(x).search(q, 7, use_pallas=True)
    d2, i2 = FlatIndex("l2", mesh=mesh, dtype=dtype).add(x).search(q, 7, use_pallas=True)
    assert np.asarray(i2).max() < 203
    np.testing.assert_array_equal(np.sort(i1, 1), np.sort(i2, 1))
    np.testing.assert_allclose(np.sort(d1, 1), np.sort(d2, 1), rtol=1e-4, atol=1e-4)
