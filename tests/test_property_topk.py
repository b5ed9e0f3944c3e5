"""Property-based tests (hypothesis): the exact-search contract holds for
arbitrary shapes, scales, and degenerate inputs."""

import numpy as np
from hypothesis import given, settings, strategies as st

from image_search_engine_tpu.ops import distances as D
from image_search_engine_tpu.ops.topk_pallas import topk_twophase

from tests.test_distances import brute_topk


@settings(max_examples=25, deadline=None)
@given(
    n=st.integers(2, 300),
    d=st.integers(1, 70),
    q=st.integers(1, 9),
    k=st.integers(1, 20),
    scale=st.sampled_from([1e-3, 1.0, 1e3]),
    seed=st.integers(0, 2**31 - 1),
)
def test_topk_flat_property(n, d, q, k, scale, seed):
    rng = np.random.default_rng(seed)
    x = (rng.standard_normal((n, d)) * scale).astype(np.float32)
    qv = (rng.standard_normal((q, d)) * scale).astype(np.float32)
    kk = min(k, n)
    dist, idx = D.topk_flat(qv, x, kk, "l2")
    dist, idx = np.asarray(dist), np.asarray(idx)
    # indices valid and unique per row
    assert ((idx >= 0) & (idx < n)).all()
    for row in idx:
        assert len(set(row.tolist())) == kk
    # distances ascending and consistent with the returned indices
    assert (np.diff(dist, axis=1) >= -1e-3 * scale**2).all()
    bd, bi = brute_topk(qv, x, kk, "l2")
    # compare distance VALUES (ties can permute indices)
    np.testing.assert_allclose(dist, bd, rtol=1e-3, atol=1e-5 * scale**2)


@settings(max_examples=15, deadline=None)
@given(
    n=st.integers(10, 400),
    d=st.integers(2, 64),
    k=st.integers(1, 10),
    seed=st.integers(0, 2**31 - 1),
)
def test_twophase_matches_flat_property(n, d, k, seed):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((n, d)).astype(np.float32)
    qv = rng.standard_normal((4, d)).astype(np.float32)
    kk = min(k, n)
    d1, i1 = topk_twophase(qv, x, kk, "l2", tile_n=128)
    d2, i2 = D.topk_flat(qv, x, kk, "l2")
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), rtol=1e-3, atol=1e-5)


@settings(max_examples=10, deadline=None)
@given(seed=st.integers(0, 2**31 - 1))
def test_duplicate_heavy_store(seed):
    # stores dominated by duplicates: distances must still be correct
    rng = np.random.default_rng(seed)
    base = rng.standard_normal((4, 8)).astype(np.float32)
    x = base[rng.integers(0, 4, 100)]
    qv = base[:2]
    dist, idx = D.topk_flat(qv, x, 5, "l2")
    assert np.allclose(np.asarray(dist)[:, 0], 0.0, atol=1e-5)
