"""Hierarchical candidate select prototype: two small top-ks instead of
one 7813-wide one.

The fused pipeline's select step (`lax.top_k` over (Q, ngroups) mins)
costs ~0.9 ms of the ~8 ms dispatch. Coverage argument nests: a
supergroup (8 groups) containing a top-k element has supermin <= d_k, and
at most k supergroups can, so top-(k+m') supergroups -> gather their 64
group mins -> top-(k+m) groups covers the exact answer. This swaps the
wide top_k for a (Q, 977) top_k + small gather + (Q, ~128) top_k — all
XLA epilogue, no kernel change.

Times the FULL pipeline with hierarchical vs flat select and validates
agreement against the production path over all dispatches.

    python benchmarks/hier_select.py
"""

from __future__ import annotations

import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

N, D, Q, K, ITERS, TILE_N = 1_000_000, 128, 2048, 10, 20, 4096
SUP = 8  # groups per supergroup


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from image_search_engine_tpu.ops import topk_pallas as tp
    from image_search_engine_tpu.ops.topk_pallas import topk_twophase
    from image_search_engine_tpu.parallel.topk import PAD_NORM

    assert jax.default_backend() == "tpu"
    GROUP = tp.GROUP

    rng = np.random.default_rng(0)
    xh = rng.standard_normal((N, D)).astype(np.float32)
    x = jnp.asarray(xh, jnp.bfloat16)
    xb32 = np.asarray(x, np.float32)
    xn = jnp.asarray(np.sum(xb32 * xb32, axis=1))
    qh = rng.standard_normal((ITERS, Q, D)).astype(np.float32)
    qs = [jnp.asarray(qh[i]) for i in range(ITERS)]

    npad = tp.round_up(N, TILE_N)
    ngroups = npad // GROUP

    def build(sup_margin, t_margin):
        """Full two-phase search with hierarchical select (mirrors
        topk_twophase's fused path; select stage swapped)."""
        t = K + t_margin
        ts = K + sup_margin
        nsup = -(-ngroups // SUP)

        @jax.jit
        def fn(q):
            qn_rows, d = q.shape
            dp = tp.round_up(d, 128)
            qp = tp.round_up(qn_rows, 16)
            qb = 8
            qf = jnp.pad(q.astype(jnp.bfloat16), ((0, qp - qn_rows), (0, dp - d)))
            xf = jnp.pad(x, ((0, npad - N), (0, dp - d)))
            norms = jnp.pad(xn, (0, npad - N), constant_values=PAD_NORM)
            vmem = min(int(1.5 * (qp * TILE_N * 4 + 2 * TILE_N * dp * 2
                                  + qp * dp * 4)) + (1 << 20), 112 << 20)
            mins = pl.pallas_call(
                functools.partial(tp._groupmin_kernel, tile_n=TILE_N),
                grid=(npad // TILE_N,),
                in_specs=[
                    pl.BlockSpec((qp, dp), lambda i: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((TILE_N,), lambda i: (i,), memory_space=pltpu.VMEM),
                    pl.BlockSpec((TILE_N, dp), lambda i: (i, 0), memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((TILE_N // GROUP, qp), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((ngroups, qp), jnp.float32),
                compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem),
            )(qf, norms, xf).T  # (Qp, ngroups)

            # hierarchical select
            pad_g = nsup * SUP - ngroups
            mp = jnp.pad(mins, ((0, 0), (0, pad_g)), constant_values=jnp.inf)
            sup = mp.reshape(qp, nsup, SUP).min(axis=2)  # (Qp, nsup)
            _, sup_idx = jax.lax.top_k(-sup, ts)  # (Qp, ts)
            # gather the chosen supergroups' group mins + their global ids
            gmins = jnp.take_along_axis(
                mp.reshape(qp, nsup, SUP), sup_idx[..., None], axis=1
            ).reshape(qp, ts * SUP)
            gids = (sup_idx[..., None] * SUP
                    + jnp.arange(SUP, dtype=jnp.int32)).reshape(qp, ts * SUP)
            _, pos = jax.lax.top_k(-gmins, t)
            cand_groups = jnp.take_along_axis(gids, pos, axis=1)  # (Qp, t)

            cand_flat = cand_groups.reshape(-1).astype(jnp.int32)

            def xn_map(j):
                return lambda i, jt, cand: (cand[(i * qb + j) * t + jt], 0)

            def nn_map(j):
                return lambda i, jt, cand: (cand[(i * qb + j) * t + jt], 0, 0)

            norms_3d = norms.reshape(ngroups, 1, GROUP)
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(qp // qb, t),
                in_specs=[
                    pl.BlockSpec((qb, dp), lambda i, jt, cand: (i, 0)),
                    *[pl.BlockSpec((GROUP, dp), xn_map(j)) for j in range(qb)],
                    *[pl.BlockSpec((1, 1, GROUP), nn_map(j)) for j in range(qb)],
                ],
                out_specs=pl.BlockSpec((qb, GROUP), lambda i, jt, cand: (i, jt)),
            )
            scores = pl.pallas_call(
                functools.partial(tp._fused_rescore_kernel, qb=qb, f32_store=False),
                grid_spec=grid_spec,
                out_shape=jax.ShapeDtypeStruct((qp, t * GROUP), jnp.float32),
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=min(
                        int(3.0 * qb * (GROUP * dp * 2 + GROUP * 4)) + (4 << 20),
                        112 << 20)),
            )(cand_flat, qf, *([xf] * qb), *([norms_3d] * qb))
            scores = scores[:qn_rows]
            offs = jnp.arange(GROUP, dtype=jnp.int32)
            flat_ids = (cand_groups[:qn_rows, :, None] * GROUP + offs).reshape(
                qn_rows, t * GROUP)
            vals, pos2 = jax.lax.top_k(-scores, K)
            ids = jnp.take_along_axis(flat_ids, pos2, axis=1)
            qnorm = jnp.sum(q.astype(jnp.float32) * q, axis=1, keepdims=True)
            return jnp.maximum(-vals + qnorm, 0.0), ids

        return fn

    def prod(q):
        return topk_twophase(q, x, K, "l2", x_norms=xn, tile_n=TILE_N, t_margin=2)

    tiny = jax.jit(lambda v: v + 1.0)
    _ = np.asarray(tiny(jnp.zeros((8, 128))))
    t0 = time.time()
    for _ in range(3):
        _ = np.asarray(tiny(jnp.zeros((8, 128))))
    rtt = (time.time() - t0) / 3

    fn = build(sup_margin=4, t_margin=2)
    # agreement vs production over all dispatches
    mism = 0
    for it in range(ITERS):
        ip = np.asarray(prod(qs[it])[1])
        ih = np.asarray(fn(qs[it])[1])
        mism += int((~(np.sort(ip, 1) == np.sort(ih, 1)).all(1)).sum())
    print(f"hier(m'=4,m=2) vs production m2: {mism} / {ITERS*Q} mismatches",
          flush=True)

    for name, f in (("production m2", prod), ("hier m'=4 m=2", fn)):
        d, i = f(qs[0])
        _ = np.asarray(d)
        t0 = time.time()
        for it in range(ITERS):
            d, i = f(qs[it])
        _ = np.asarray(d)
        el = max(time.time() - t0 - rtt, 1e-9)
        print(f"{name}: {el/ITERS*1e3:.2f} ms/dispatch, "
              f"{ITERS*Q/el/1e3:.1f}k QPS", flush=True)


if __name__ == "__main__":
    main()
