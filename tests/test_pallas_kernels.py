"""Pallas kernels (interpret mode on CPU) vs the pure-JAX reference ops."""

import numpy as np
import pytest

from image_search_engine_tpu.ops import distances as D
from image_search_engine_tpu.ops import kmeans as KM
from image_search_engine_tpu.ops.kmeans_pallas import assign_pallas
from image_search_engine_tpu.ops.topk_pallas import topk_pallas


@pytest.mark.parametrize("metric", ["l2", "ip", "cosine"])
@pytest.mark.parametrize("n,d,q,k", [(500, 32, 5, 10), (2100, 96, 9, 20)])
def test_topk_pallas_matches_reference(rng, metric, n, d, q, k):
    qv = rng.standard_normal((q, d)).astype(np.float32)
    xv = rng.standard_normal((n, d)).astype(np.float32)
    pd, pi = topk_pallas(qv, xv, k, metric, tile_n=256)
    rd, ri = D.topk_flat(qv, xv, k, metric)
    np.testing.assert_array_equal(np.asarray(pi), np.asarray(ri))
    np.testing.assert_allclose(np.asarray(pd), np.asarray(rd), rtol=2e-4, atol=2e-4)


def test_topk_pallas_single_query_k1(rng):
    qv = rng.standard_normal((1, 16)).astype(np.float32)
    xv = rng.standard_normal((300, 16)).astype(np.float32)
    pd, pi = topk_pallas(qv, xv, 1, "l2", tile_n=128)
    rd, ri = D.topk_flat(qv, xv, 1, "l2")
    np.testing.assert_array_equal(np.asarray(pi), np.asarray(ri))


def test_topk_pallas_duplicate_rows(rng):
    # exact duplicates: distances tie; indices must still be valid matches
    xv = rng.standard_normal((64, 8)).astype(np.float32)
    xv = np.concatenate([xv, xv])  # every row twice
    qv = xv[:3]
    pd, pi = topk_pallas(qv, xv, 4, "l2", tile_n=128)
    assert np.allclose(np.asarray(pd)[:, :2], 0.0, atol=1e-4)


def test_assign_pallas_matches_jax(rng):
    x = rng.standard_normal((700, 40)).astype(np.float32)
    c = rng.standard_normal((37, 40)).astype(np.float32)
    pc, pdist = assign_pallas(x, c, tile_n=256)
    jc, jdist = KM.assign_jax(x, c)
    np.testing.assert_array_equal(np.asarray(pc), np.asarray(jc))
    np.testing.assert_allclose(np.asarray(pdist), np.asarray(jdist), rtol=1e-3, atol=1e-3)


def test_kmeans_with_pallas_assign(rng):
    # full Lloyd training with the Pallas assignment plugged in
    x = rng.standard_normal((400, 16)).astype(np.float32)
    km_p = KM.KMeans(n_clusters=8, niter=8, nredo=1, seed=1, spherical=False,
                     assign_fn=lambda a, b: assign_pallas(a, b, tile_n=128)).fit(x)
    km_j = KM.KMeans(n_clusters=8, niter=8, nredo=1, seed=1, spherical=False).fit(x)
    np.testing.assert_allclose(km_p.cluster_centers_, km_j.cluster_centers_, rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize("metric", ["l2", "ip", "cosine"])
@pytest.mark.parametrize("n,d,q,k", [(500, 32, 5, 10), (3000, 96, 64, 20)])
def test_topk_twophase_matches_reference(rng, metric, n, d, q, k):
    from image_search_engine_tpu.ops.topk_pallas import topk_twophase

    qv = rng.standard_normal((q, d)).astype(np.float32)
    xv = rng.standard_normal((n, d)).astype(np.float32)
    pd, pi = topk_twophase(qv, xv, k, metric, tile_n=512)
    rd, ri = D.topk_flat(qv, xv, k, metric)
    np.testing.assert_array_equal(np.asarray(pi), np.asarray(ri))
    np.testing.assert_allclose(np.asarray(pd), np.asarray(rd), rtol=2e-4, atol=2e-4)


def test_topk_twophase_clustered_data(rng):
    # clustered data stresses the "top-k concentrated in few groups" case
    from image_search_engine_tpu.ops.topk_pallas import topk_twophase

    c = rng.standard_normal((5, 16)).astype(np.float32) * 5
    xv = np.concatenate([c[i] + 0.1 * rng.standard_normal((400, 16)).astype(np.float32) for i in range(5)])
    qv = c + 0.01
    pd, pi = topk_twophase(qv, xv, 10, "l2", tile_n=512)
    rd, ri = D.topk_flat(qv, xv, 10, "l2")
    np.testing.assert_array_equal(np.asarray(pi), np.asarray(ri))


def test_topk_twophase_small_store(rng):
    from image_search_engine_tpu.ops.topk_pallas import topk_twophase

    qv = rng.standard_normal((3, 8)).astype(np.float32)
    xv = rng.standard_normal((50, 8)).astype(np.float32)
    pd, pi = topk_twophase(qv, xv, 5, "l2")
    rd, ri = D.topk_flat(qv, xv, 5, "l2")
    np.testing.assert_array_equal(np.asarray(pi), np.asarray(ri))


def test_topk_twophase_int8_store(rng):
    from image_search_engine_tpu.ops.topk_pallas import quantize_store_int8, topk_twophase

    xv = rng.standard_normal((2000, 64)).astype(np.float32)
    qv = rng.standard_normal((16, 64)).astype(np.float32)
    codes, scale = quantize_store_int8(xv)
    deq = np.asarray(codes).astype(np.float32) * np.asarray(scale)[:, None]
    np.testing.assert_allclose(deq, xv, atol=np.abs(xv).max() / 100)

    pd, pi = topk_twophase(qv, codes, 10, "l2", x_scale=scale, tile_n=512)
    rd, ri = D.topk_flat(qv, xv, 10, "l2")
    # int8 sweep + f32 rescore: near-perfect recall vs the f32 exact search
    pi, ri = np.asarray(pi), np.asarray(ri)
    recall = np.mean([len(set(a) & set(b)) / 10 for a, b in zip(pi.tolist(), ri.tolist())])
    assert recall >= 0.95, recall
