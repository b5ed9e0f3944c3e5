"""Fused batched IVF probed-scan kernel vs the XLA gather path."""

import jax.numpy as jnp
import numpy as np
import pytest

from image_search_engine_tpu.index.flat import FlatIndex
from image_search_engine_tpu.index.ivf import IVFIndex
from image_search_engine_tpu.ops.ivf_pallas import ivf_probed_topk


def recall_at_k(got, true):
    hits = 0
    for g, t in zip(got, true):
        hits += len(set(g.tolist()) & set(t.tolist()))
    return hits / true.size


@pytest.fixture
def ivf_corpus(rng):
    centers = rng.standard_normal((8, 32)).astype(np.float32) * 4
    x = np.concatenate(
        [c + rng.standard_normal((150, 32)).astype(np.float32) for c in centers])
    q = x[rng.choice(len(x), 24, replace=False)] + 0.05 * rng.standard_normal(
        (24, 32)).astype(np.float32)
    return x, q


def test_probed_scan_matches_xla_ivf(ivf_corpus):
    x, q = ivf_corpus
    ivf = IVFIndex(nlist=8, nprobe=4).add(x)
    nprobe = ivf._effective_nprobe()
    d1, i1, ok1 = ivf_probed_topk(
        jnp.asarray(q), jnp.asarray(ivf.bucket_centroids),
        jnp.asarray(ivf.packed), jnp.asarray(ivf.packed_norms),
        jnp.asarray(ivf.lists), 10, nprobe, qb=4,
    )
    d2, i2 = ivf.search(q, 10)
    # identical probes, identical scan set -> identical neighbor sets
    np.testing.assert_array_equal(np.sort(np.asarray(i1), 1), np.sort(i2, 1))
    np.testing.assert_allclose(np.sort(np.asarray(d1), 1), np.sort(d2, 1),
                               rtol=1e-3, atol=1e-3)


def test_probed_scan_pallas_select_matches_xla_select(ivf_corpus):
    """select_impl="pallas" (the flat path's t-pass extract-min over the
    transposed scores) must produce the same neighbors/distances as the
    lax.top_k select — exact-tie order may differ, sets may not."""
    x, q = ivf_corpus
    ivf = IVFIndex(nlist=8, nprobe=4).add(x)
    nprobe = ivf._effective_nprobe()
    args = (jnp.asarray(q), jnp.asarray(ivf.bucket_centroids),
            jnp.asarray(ivf.packed), jnp.asarray(ivf.packed_norms),
            jnp.asarray(ivf.lists))
    d1, i1, ok1 = ivf_probed_topk(*args, 10, nprobe, qb=4,
                                  select_impl="xla")
    d2, i2, ok2 = ivf_probed_topk(*args, 10, nprobe, qb=4,
                                  select_impl="pallas")
    np.testing.assert_array_equal(np.sort(np.asarray(i1), 1),
                                  np.sort(np.asarray(i2), 1))
    np.testing.assert_allclose(np.sort(np.asarray(d1), 1),
                               np.sort(np.asarray(d2), 1),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(ok1), np.asarray(ok2))


def test_probed_scan_bf16_table(ivf_corpus):
    x, q = ivf_corpus
    ivf = IVFIndex(nlist=8, nprobe=8, table_dtype="bf16").add(x)
    nprobe = ivf._effective_nprobe()
    d1, i1, ok1 = ivf_probed_topk(
        jnp.asarray(q), jnp.asarray(ivf.bucket_centroids),
        jnp.asarray(ivf.packed), jnp.asarray(ivf.packed_norms),
        jnp.asarray(ivf.lists), 10, nprobe,
    )
    flat = FlatIndex("l2").add(x)
    _, fi = flat.search(q, 10)
    assert recall_at_k(np.asarray(i1), fi) >= 0.9


def test_probed_scan_underfull_probes(rng):
    # fewer candidates than k in the probed buckets: ok=False / ids=-1 tail
    x = rng.standard_normal((20, 16)).astype(np.float32)
    ivf = IVFIndex(nlist=10, nprobe=1).add(x)
    d, i, ok = ivf_probed_topk(
        jnp.asarray(x[:3]), jnp.asarray(ivf.bucket_centroids),
        jnp.asarray(ivf.packed), jnp.asarray(ivf.packed_norms),
        jnp.asarray(ivf.lists), 10, 1, qb=2,
    )
    ok = np.asarray(ok)
    assert (~ok).any()
    assert (np.asarray(i)[~ok] == -1).all() or not np.isfinite(np.asarray(d)[~ok]).any()


def test_ivf_search_batched_entry(ivf_corpus):
    # the IVFIndex surface: search_batched routes through the kernel
    x, q = ivf_corpus
    ivf = IVFIndex(nlist=8, nprobe=4).add(x)
    d1, i1 = ivf.search_batched(q, 10)
    d2, i2 = ivf.search(q, 10)
    np.testing.assert_array_equal(np.sort(i1, 1), np.sort(i2, 1))
    np.testing.assert_allclose(np.sort(d1, 1), np.sort(d2, 1), rtol=1e-3, atol=1e-3)


def test_ivf_search_batched_cosine(rng):
    x = rng.standard_normal((400, 16)).astype(np.float32)
    q = rng.standard_normal((6, 16)).astype(np.float32)
    ivf = IVFIndex(metric="cosine", nlist=4, nprobe=4).add(x)
    d1, i1 = ivf.search_batched(q, 5)
    d2, i2 = ivf.search(q, 5)
    np.testing.assert_array_equal(np.sort(i1, 1), np.sort(i2, 1))
    np.testing.assert_allclose(np.sort(d1, 1), np.sort(d2, 1), rtol=1e-3, atol=1e-3)
