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
