"""Merged single-kernel two-phase (ops/topk_merged.py) parity vs the
production two-phase and brute force — interpret mode on CPU (Mosaic
layout rules are chip-checked by benchmarks/merged_twophase.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from image_search_engine_tpu.ops.topk_merged import topk_merged
from image_search_engine_tpu.parallel.topk import PAD_NORM


def brute(q, x, k, metric):
    if metric == "ip":
        s = q @ x.T
        idx = np.argsort(-s, axis=1, kind="stable")[:, :k]
        return np.take_along_axis(s, idx, 1), idx
    d2 = ((q[:, None, :] - x[None]) ** 2).sum(-1)
    idx = np.argsort(d2, axis=1, kind="stable")[:, :k]
    return np.take_along_axis(d2, idx, 1), idx


@pytest.mark.parametrize("metric", ["l2", "ip"])
@pytest.mark.parametrize("n,qn,k", [(8192, 40, 4), (16384, 200, 10)])
def test_merged_matches_brute(rng, metric, n, qn, k):
    x = rng.standard_normal((n, 64)).astype(np.float32)
    q = rng.standard_normal((qn, 64)).astype(np.float32)
    d, i, cert = topk_merged(jnp.asarray(q), jnp.asarray(x), k, metric,
                             tile_n=512, t_margin=2, qb_rows=128,
                             with_certificate=True)
    bd, bi = brute(q, x, k, metric)
    assert np.asarray(cert).all(), "certificate must pass on Gaussian data"
    np.testing.assert_array_equal(np.asarray(i), bi)
    np.testing.assert_allclose(np.asarray(d), bd, rtol=1e-4, atol=1e-4)


def test_merged_multiblock_matches_brute(rng):
    # qn > qb_rows: exercises the cross-block pipeline (sweep of block
    # b+1 interleaved with block b's candidate rescore)
    n, qn, k = 16384, 300, 5
    x = rng.standard_normal((n, 32)).astype(np.float32)
    q = rng.standard_normal((qn, 32)).astype(np.float32)
    d, i = topk_merged(jnp.asarray(q), jnp.asarray(x), k, "l2",
                       tile_n=512, t_margin=2, qb_rows=128)
    bd, bi = brute(q, x, k, "l2")
    np.testing.assert_array_equal(np.asarray(i), bi)
    np.testing.assert_allclose(np.asarray(d), bd, rtol=1e-4, atol=1e-4)


def test_merged_matches_twophase_bf16(rng):
    from image_search_engine_tpu.ops.topk_pallas import topk_twophase

    n, qn, k = 16384, 130, 6
    x32 = rng.standard_normal((n, 64)).astype(np.float32)
    x = jnp.asarray(x32, jnp.bfloat16)
    q = rng.standard_normal((qn, 64)).astype(np.float32)
    norms = jnp.sum(jnp.asarray(x, jnp.float32) ** 2, axis=1)
    dm, im = topk_merged(jnp.asarray(q), x, k, "l2", x_norms=norms,
                         tile_n=512, t_margin=2, qb_rows=128)
    dt, it = topk_twophase(jnp.asarray(q), x, k, "l2", x_norms=norms,
                           tile_n=512, t_margin=2)[:2]
    # identical candidate semantics -> identical results up to bf16
    # near-tie ordering; compare sets + sorted distances
    for a, b in zip(np.asarray(im).tolist(), np.asarray(it).tolist()):
        assert set(a) == set(b), (a, b)
    np.testing.assert_allclose(np.sort(np.asarray(dm), 1),
                               np.sort(np.asarray(dt), 1), rtol=1e-3,
                               atol=1e-3)


def test_merged_prepadded_store_poisoned_norms(rng):
    # pad rows carried in data (PAD_NORM) must never surface
    n_real, n_pad = 7000, 7168
    x = np.zeros((n_pad, 32), np.float32)
    x[:n_real] = rng.standard_normal((n_real, 32)).astype(np.float32)
    norms = np.full((n_pad,), PAD_NORM, np.float32)
    norms[:n_real] = (x[:n_real] ** 2).sum(1)
    q = np.zeros((8, 32), np.float32)  # near-origin: pads would win
    d, i = topk_merged(jnp.asarray(q), jnp.asarray(x), 5, "l2",
                       x_norms=jnp.asarray(norms), tile_n=512, t_margin=2,
                       qb_rows=128)
    assert (np.asarray(i) < n_real).all(), np.asarray(i)


def test_merged_refuses_pathological_chunking(rng):
    # tiny corpus vs query block: the merged schedule would need a huge
    # per-step unroll — must refuse loudly (topk_twophase's regime)
    x = rng.standard_normal((1024, 32)).astype(np.float32)
    q = rng.standard_normal((200, 32)).astype(np.float32)
    with pytest.raises(ValueError, match="too small"):
        topk_merged(jnp.asarray(q), jnp.asarray(x), 10, "l2", tile_n=512)
