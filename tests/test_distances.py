"""Distance / exact top-k ops vs NumPy brute force (the reference's own
faiss-vs-dict cross-check pattern, backend/siamese/test_index.py:49-71,
generalized)."""

import numpy as np
import pytest

from image_search_engine_tpu.ops import distances as D


def brute_topk(q, x, k, metric):
    if metric == "l2":
        d = ((q[:, None, :] - x[None, :, :]) ** 2).sum(-1)
        idx = np.argsort(d, axis=1, kind="stable")[:, :k]
        return np.take_along_axis(d, idx, axis=1), idx
    if metric in ("ip", "cosine"):
        if metric == "cosine":
            q = q / np.linalg.norm(q, axis=1, keepdims=True)
            x = x / np.linalg.norm(x, axis=1, keepdims=True)
        d = q @ x.T
        idx = np.argsort(-d, axis=1, kind="stable")[:, :k]
        return np.take_along_axis(d, idx, axis=1), idx
    if metric == "chi2":
        d = 0.5 * ((q[:, None, :] - x[None, :, :]) ** 2 / (q[:, None, :] + x[None, :, :] + 1e-10)).sum(-1)
        idx = np.argsort(d, axis=1, kind="stable")[:, :k]
        return np.take_along_axis(d, idx, axis=1), idx
    raise ValueError(metric)


@pytest.mark.parametrize("metric", ["l2", "ip", "cosine", "chi2"])
def test_pairwise_matches_numpy(rng, metric):
    q = rng.standard_normal((7, 33)).astype(np.float32)
    x = rng.standard_normal((50, 33)).astype(np.float32)
    if metric == "chi2":  # histograms are nonnegative
        q, x = np.abs(q), np.abs(x)
    got = np.asarray(D.pairwise(q, x, metric))
    if metric == "l2":
        want = ((q[:, None, :] - x[None, :, :]) ** 2).sum(-1)
    elif metric == "ip":
        want = q @ x.T
    elif metric == "cosine":
        qn = q / np.linalg.norm(q, axis=1, keepdims=True)
        xn = x / np.linalg.norm(x, axis=1, keepdims=True)
        want = qn @ xn.T
    else:
        want = 0.5 * ((q[:, None, :] - x[None, :, :]) ** 2 / (q[:, None, :] + x[None, :, :] + 1e-10)).sum(-1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("metric", ["l2", "ip", "cosine"])
def test_topk_flat_matches_brute_force(rng, metric):
    q = rng.standard_normal((5, 24)).astype(np.float32)
    x = rng.standard_normal((300, 24)).astype(np.float32)
    k = 10
    dist, idx = D.topk_flat(q, x, k, metric)
    bd, bidx = brute_topk(q, x, k, metric)
    np.testing.assert_allclose(np.asarray(dist), bd, rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(idx), bidx)


@pytest.mark.parametrize("metric", ["l2", "ip"])
def test_topk_chunked_matches_unchunked(rng, metric):
    q = rng.standard_normal((4, 16)).astype(np.float32)
    x = rng.standard_normal((1000, 16)).astype(np.float32)
    k = 13
    d1, i1 = D.topk_flat(q, x, k, metric)
    d2, i2 = D.topk_flat_chunked(q, x, k, metric, chunk=256)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))


def test_topk_chunked_ragged_tail(rng):
    # store size not a multiple of chunk; padding rows must never appear
    q = rng.standard_normal((3, 8)).astype(np.float32)
    x = rng.standard_normal((103, 8)).astype(np.float32)
    d, i = D.topk_flat_chunked(q, x, 7, "l2", chunk=32)
    assert np.asarray(i).max() < 103
    bd, bi = brute_topk(q, x, 7, "l2")
    np.testing.assert_array_equal(np.asarray(i), bi)


def test_l2_normalize(rng):
    x = rng.standard_normal((10, 5)).astype(np.float32)
    n = np.asarray(D.l2_normalize(x))
    np.testing.assert_allclose(np.linalg.norm(n, axis=1), 1.0, rtol=1e-5)


def test_chi2_chunked_matches_dense(rng):
    # the chunked chi2 scan (N > CHI2_CHUNK never materializes (Q, N, d))
    # must agree exactly with the dense path
    import jax.numpy as jnp

    from image_search_engine_tpu.ops.distances import pairwise_chi2
    from image_search_engine_tpu.parallel.topk import _chi2_topk_chunked

    q = rng.random((5, 32)).astype(np.float32)
    x = rng.random((1000, 32)).astype(np.float32)
    penalty = jnp.zeros((1000,))
    d1, i1 = _chi2_topk_chunked(jnp.asarray(q), jnp.asarray(x), penalty, 7,
                                chunk=128)
    s = np.asarray(pairwise_chi2(jnp.asarray(q), jnp.asarray(x)))
    ref_i = np.argsort(s, axis=1)[:, :7]
    np.testing.assert_array_equal(np.asarray(i1), ref_i)
    np.testing.assert_allclose(np.asarray(d1), np.sort(s, axis=1)[:, :7],
                               rtol=1e-5, atol=1e-6)


def test_chi2_chunked_respects_pad_poisoning(rng):
    import jax.numpy as jnp

    from image_search_engine_tpu.parallel.topk import PAD_NORM, _chi2_topk_chunked

    q = rng.random((3, 16)).astype(np.float32)
    x = np.zeros((300, 16), np.float32)
    x[:200] = rng.random((200, 16)).astype(np.float32)
    penalty = jnp.where(jnp.arange(300) < 200, 0.0, PAD_NORM)
    d1, i1 = _chi2_topk_chunked(jnp.asarray(q), jnp.asarray(x), penalty, 10,
                                chunk=64)
    assert np.asarray(i1).max() < 200


def test_flat_chi2_large_store_via_chunks(rng):
    # FlatIndex("chi2") beyond CHI2_CHUNK rows goes through the scan path
    from image_search_engine_tpu.index.flat import FlatIndex
    from image_search_engine_tpu.parallel.topk import CHI2_CHUNK

    n = CHI2_CHUNK + 500
    x = rng.random((n, 16)).astype(np.float32)
    q = x[:4] + 0.01
    idx = FlatIndex("chi2").add(x)
    d, i = idx.search(q, 5)
    assert (i[:, 0] == np.arange(4)).all()  # self-ish match first
    assert np.isfinite(d).all()
