"""Phase-2 DMA-issue experiment: can fewer DMA issues per grid step beat
the production fused rescore?

The fused pipeline is grid-step/DMA-issue bound, not bandwidth bound
(BENCH_NOTES: int8's 4x-smaller candidate DMAs did NOT speed it up, and
narrower margins measured SLOWER). Each production grid step issues
qb=8 (GROUP, dp) vector DMAs + qb=8 tiny (1, 1, GROUP) norm DMAs + 1
output DMA = 17 issues/step. Variant "cross-only" removes the 8 norm
DMAs: the kernel emits raw cross products (qb, GROUP) and the norms are
pre-gathered by XLA into a contiguous (Q, t*GROUP) array added in the
epilogue — 9 issues/step, identical vector traffic, identical scores
(same bf16 products, same f32 accumulation; the epilogue add is
reassociated vs the in-kernel form by at most one f32 rounding of
norm - 2*cross, which commutes exactly: both compute a - 2b in f32).

    python benchmarks/rescore_dma_variants.py
"""

from __future__ import annotations

import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

N, D, Q, K, ITERS, TILE_N, MARGIN, QB = 1_000_000, 128, 2048, 10, 20, 4096, 2, 8


def _cross_only_kernel(cand_ref, *refs, qb: int):
    """Variant kernel: gather + cross product only; no norm refs."""
    import jax
    import jax.numpy as jnp

    q_ref = refs[0]
    x_refs = refs[1 : 1 + qb]
    out_ref = refs[1 + qb]
    for j in range(qb):
        xb = x_refs[j][:]
        cross = jax.lax.dot_general(
            q_ref[j][None, :], xb,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (1, GROUP)
        out_ref[j, :] = cross[0]


def twophase_cross_only(q, x, k, *, x_norms, tile_n, t_margin, qb):
    """bf16/l2 two-phase with the cross-only phase-2 kernel."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from image_search_engine_tpu.ops.topk_pallas import (
        GROUP, _groupmin_kernel, round_up)
    from image_search_engine_tpu.parallel.topk import PAD_NORM

    qn_rows, d = q.shape
    n = x.shape[0]
    dp = round_up(d, 128)
    qp = round_up(round_up(qn_rows, 16), qb)
    tile_n = round_up(tile_n, 8 * GROUP)
    npad = round_up(n, tile_n)
    ngroups = npad // GROUP

    qf = jnp.pad(q.astype(jnp.bfloat16), ((0, qp - qn_rows), (0, dp - d)))
    xf = jnp.pad(x.astype(jnp.bfloat16), ((0, npad - n), (0, dp - d)))
    norms = jnp.pad(x_norms, (0, npad - n), constant_values=PAD_NORM)

    grid = (npad // tile_n,)
    vmem_bytes = min(
        int(1.5 * (qp * tile_n * 4 + 2 * tile_n * dp * 2 + qp * dp * 4))
        + (1 << 20), 112 * (1 << 20))
    mins = pl.pallas_call(
        functools.partial(_groupmin_kernel, tile_n=tile_n),
        grid=grid,
        in_specs=[
            pl.BlockSpec((qp, dp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, dp), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_n // GROUP, qp), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ngroups, qp), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_bytes),
    )(qf, norms, xf).T  # (Qp, ngroups)

    t = min(k + t_margin, ngroups)
    qp2 = min(qp, round_up(qn_rows, qb))
    _, cand_groups = jax.lax.top_k(-mins[:qp2], t)  # (Qp2, t)
    cand_flat = cand_groups.reshape(-1).astype(jnp.int32)

    def xn_map(j):
        return lambda i, jt, cand: (cand[(i * qb + j) * t + jt], 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(qp2 // qb, t),
        in_specs=[
            pl.BlockSpec((qb, dp), lambda i, jt, cand: (i, 0)),
            *[pl.BlockSpec((GROUP, dp), xn_map(j)) for j in range(qb)],
        ],
        out_specs=pl.BlockSpec((qb, GROUP), lambda i, jt, cand: (i, jt)),
    )
    cross = pl.pallas_call(
        functools.partial(_cross_only_kernel, qb=qb),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((qp2, t * GROUP), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(int(3.0 * qb * GROUP * dp * 2) + (4 << 20),
                                 112 * (1 << 20))),
    )(cand_flat, qf, *([xf] * qb))

    cross = cross[:qn_rows]
    cand_groups = cand_groups[:qn_rows]
    # XLA epilogue: pre-gathered norms (contiguous (Q, t*GROUP)) + top-k
    cn = norms.reshape(ngroups, GROUP)[cand_groups].reshape(qn_rows, t * GROUP)
    scores = cn - 2.0 * cross
    offs = jnp.arange(GROUP, dtype=jnp.int32)
    flat_ids = (cand_groups[..., None] * GROUP + offs).reshape(qn_rows, t * GROUP)
    vals, pos = jax.lax.top_k(-scores, min(k, t * GROUP))
    ids = jnp.take_along_axis(flat_ids, pos, axis=1)
    qnorm = jnp.sum(q.astype(jnp.float32) * q, axis=1, keepdims=True)
    return jnp.maximum(-vals + qnorm, 0.0), ids


def main():
    import jax
    import jax.numpy as jnp

    from image_search_engine_tpu.ops.topk_pallas import topk_twophase

    assert jax.default_backend() == "tpu"

    rng = np.random.default_rng(0)
    xh = rng.standard_normal((N, D)).astype(np.float32)
    x = jnp.asarray(xh, jnp.bfloat16)
    xb32 = np.asarray(x, np.float32)
    xn = jnp.asarray(np.sum(xb32 * xb32, axis=1))
    qh = rng.standard_normal((ITERS, Q, D)).astype(np.float32)
    qs = [jnp.asarray(qh[i]) for i in range(ITERS)]

    prod = jax.jit(functools.partial(
        topk_twophase, k=K, metric="l2", x_norms=xn, tile_n=TILE_N,
        t_margin=MARGIN, fused_rescore=True), static_argnames=())
    var = jax.jit(functools.partial(
        twophase_cross_only, k=K, x_norms=xn, tile_n=TILE_N,
        t_margin=MARGIN, qb=QB))

    # agreement check: variant vs production over one dispatch
    dp_, ip_ = prod(qs[0], x)
    dv_, iv_ = var(qs[0], x)
    ip_n, iv_n = np.asarray(ip_), np.asarray(iv_)
    mism = int((~(np.sort(ip_n, 1) == np.sort(iv_n, 1)).all(1)).sum())
    print(f"variant vs production id-set mismatches: {mism} / {Q}", flush=True)

    tiny = jax.jit(lambda v: v + 1.0)
    _ = np.asarray(tiny(jnp.zeros((8, 128))))
    t0 = time.time()
    for _ in range(3):
        _ = np.asarray(tiny(jnp.zeros((8, 128))))
    rtt = (time.time() - t0) / 3

    for name, fn in (("production", prod), ("cross-only", var)):
        d, _ = fn(qs[0], x)
        _ = np.asarray(d)
        best = None
        for _rep in range(3):
            t0 = time.time()
            for it in range(ITERS):
                d, _ = fn(qs[it], x)
            _ = np.asarray(d)
            el = max(time.time() - t0 - rtt, 1e-9)
            best = el if best is None else min(best, el)
        print(f"{name}: {best/ITERS*1e3:.2f} ms/dispatch, "
              f"{ITERS*Q/best/1e3:.1f}k QPS", flush=True)


if __name__ == "__main__":
    main()
