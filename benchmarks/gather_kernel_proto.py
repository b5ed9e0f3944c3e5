"""Prototype: phase-2 candidate gather+rescore as a Pallas kernel.

The shipped phase 2 gathers candidate groups with an XLA gather into a
(Q, t*GROUP, d) HBM buffer, then rescans it with an einsum — the gather
write + einsum read is the throughput-binding term at Q=2048. This kernel
fuses both: on a 2-D grid (query row-block, candidate slot) each step DMAs
the slot-th candidate block of 8 queries straight into VMEM (block index
maps read candidate ids from a scalar-prefetch ref), rescans them against
the resident query rows, and writes only an (8, GROUP) score tile.
Phase-2 HBM traffic drops from (write + read) of the candidate tensor to
a single streamed read.

CPU: validates against the shipped topk_twophase in interpret mode.
TPU: times the full two-phase search with the fused phase 2.

    python benchmarks/gather_kernel_proto.py [--no-time]
"""

from __future__ import annotations

import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

K = 10


def build(N, D, tile_n, t_margin, interpret, QB=8, phase1_only=False):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from image_search_engine_tpu.ops import topk_pallas as tp
    from image_search_engine_tpu.parallel.topk import PAD_NORM

    GROUP = tp.GROUP
    global _POS_INF
    _POS_INF = float("inf")
    npad = tp.round_up(N, tile_n)
    ngroups = npad // GROUP
    t = K + t_margin

    def rescore_kernel(cand_ref, *refs, t, n_valid):
        # refs: q_ref, x_0..x_{QB-1}, out_ref. Group norms are computed
        # from the gathered block itself (phase 1 must use store-dtype-
        # derived norms for consistency); pad columns are masked by their
        # global row id, reconstructed from the prefetched group id.
        q_ref = refs[0]
        x_refs = refs[1 : 1 + QB]
        out_ref = refs[1 + QB]
        i = pl.program_id(0)
        jt = pl.program_id(1)
        col_iota = jax.lax.broadcasted_iota(jnp.int32, (1, GROUP), 1)
        for j in range(QB):
            xb = x_refs[j][:]  # (GROUP, dp) store dtype
            xb32 = xb.astype(jnp.float32)
            nb = jnp.sum(xb32 * xb32, axis=1)  # (GROUP,) store-true norms
            cross = jax.lax.dot_general(
                q_ref[j][None, :], xb,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (1, GROUP)
            gid = cand_ref[(i * QB + j) * t + jt]
            valid = gid * GROUP + col_iota < n_valid
            out_ref[j, :] = jnp.where(
                valid, nb[None, :] - 2.0 * cross, _POS_INF
            )[0]

    @jax.jit
    def twophase_fused(q, x, xnorms):
        qn_rows, d = q.shape
        dp = tp.round_up(d, 128)
        qp = tp.round_up(qn_rows, max(16, QB))
        qf = jnp.pad(q.astype(x.dtype), ((0, qp - qn_rows), (0, dp - d)))
        xf = jnp.pad(x, ((0, npad - N), (0, dp - d)))
        norms = jnp.pad(xnorms, (0, npad - N), constant_values=PAD_NORM)

        vmem_bytes = min(int(1.5 * (qp * tile_n * 4 + 2 * tile_n * dp * 2
                                    + qp * dp * 4)) + (1 << 20), 112 << 20)
        mins = pl.pallas_call(
            functools.partial(tp._groupmin_kernel, tile_n=tile_n),
            grid=(npad // tile_n,),
            in_specs=[
                pl.BlockSpec((qp, dp), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_n,), lambda i: (i,), memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_n, dp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tile_n // GROUP, qp), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((ngroups, qp), jnp.float32),
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_bytes),
            interpret=interpret,
        )(qf, norms, xf).T

        _, cand_groups = jax.lax.top_k(-mins[:qp], t)  # (Qp, t); pad rows harmless
        if phase1_only:
            return cand_groups[:qn_rows].astype(jnp.float32), cand_groups[:qn_rows]
        cand_flat = cand_groups.reshape(-1).astype(jnp.int32)  # (Qp*t,)

        def x_map(j):
            # step (i, jt): the jt-th candidate group of query i*QB+j
            return lambda i, jt, cand: (cand[(i * QB + j) * t + jt], 0)

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(qp // QB, t),
            in_specs=[
                pl.BlockSpec((QB, dp), lambda i, jt, cand: (i, 0)),
                *[pl.BlockSpec((GROUP, dp), x_map(j)) for j in range(QB)],
            ],
            out_specs=pl.BlockSpec((QB, GROUP), lambda i, jt, cand: (i, jt)),
        )
        scores = pl.pallas_call(
            functools.partial(rescore_kernel, t=t, n_valid=N),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((qp, t * GROUP), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=min(
                    int(3.0 * QB * (GROUP * dp * xf.dtype.itemsize + GROUP * 4))
                    + (4 << 20),
                    112 << 20,
                )
            ),
            interpret=interpret,
        )(cand_flat, qf, *([xf] * QB))

        scores = scores[:qn_rows]
        offsets = jnp.arange(GROUP, dtype=jnp.int32)
        flat_ids = (cand_groups[:qn_rows, :, None] * GROUP + offsets).reshape(
            qn_rows, t * GROUP
        )
        vals, pos = jax.lax.top_k(-scores, K)
        ids = jnp.take_along_axis(flat_ids, pos, axis=1)
        qnorm = jnp.sum(q.astype(jnp.float32) * q, axis=1, keepdims=True)
        return jnp.maximum(-vals + qnorm, 0.0), ids

    return twophase_fused


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--no-time", action="store_true",
                    help="correctness check only (skip throughput timing)")
    ap.add_argument("--cpu", action="store_true", help="force CPU interpret mode")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from image_search_engine_tpu.ops.topk_pallas import topk_twophase

    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        N, D, Q, ITERS, tile_n = 1_000_000, 128, 2048, 20, 4096
    else:
        N, D, Q, ITERS, tile_n = 4096, 64, 32, 1, 512

    rng = np.random.default_rng(0)
    xh = rng.standard_normal((N, D)).astype(np.float32)
    x = jnp.asarray(xh, jnp.bfloat16)
    xb32 = np.asarray(x, np.float32)
    xn = jnp.asarray(np.sum(xb32 * xb32, axis=1))  # bf16-store-true norms
    qh = rng.standard_normal((ITERS, Q, D)).astype(np.float32)
    qs = [jnp.asarray(qh[i]) for i in range(ITERS)]

    fn = build(N, D, tile_n, t_margin=2, interpret=not on_tpu)

    d_ref, i_ref = topk_twophase(qs[0], x, K, "l2", x_norms=xn,
                                 tile_n=tile_n, t_margin=2, interpret=not on_tpu)
    d_f, i_f = fn(qs[0], x, xn)
    i_ref, i_f = np.asarray(i_ref), np.asarray(i_f)
    agree = float((np.sort(i_ref, 1) == np.sort(i_f, 1)).all(1).mean())
    print(f"agreement with shipped phase-2 = {agree:.4f}", flush=True)

    if on_tpu:
        # are disagreements misses or near-tie reorderings? measure both
        # against f32 brute force on the full dispatch
        q0 = qh[0]
        d_full = (q0**2).sum(1)[:, None] - 2.0 * q0 @ xh.T + (xh**2).sum(1)[None, :]
        ref = np.argpartition(d_full, K, axis=1)[:, :K]

        def rec(idx):
            return float(np.mean([len(set(a) & set(b)) / K
                                  for a, b in zip(idx.tolist(), ref.tolist())]))

        print(f"recall@10 vs f32 brute: shipped={rec(i_ref):.5f} "
              f"fused={rec(i_f):.5f}", flush=True)

        # internal-margin validation of the fused kernel: margin 2/3 vs 6
        fn6 = build(N, D, tile_n, t_margin=6, interpret=False)
        fn3 = build(N, D, tile_n, t_margin=3, interpret=False)
        for name, f in (("fused m2", fn), ("fused m3", fn3)):
            mism = 0
            for it in range(ITERS):
                i6 = np.asarray(fn6(qs[it], x, xn)[1])
                im = np.asarray(f(qs[it], x, xn)[1])
                mism += int((~(np.sort(i6, 1) == np.sort(im, 1)).all(1)).sum())
            print(f"validation {name} vs fused m6: {mism} / {ITERS*Q}", flush=True)

    if on_tpu and not args.no_time:
        tiny = jax.jit(lambda v: v + 1.0)
        _ = np.asarray(tiny(jnp.zeros((8, 128))))
        t0 = time.time()
        for _ in range(3):
            _ = np.asarray(tiny(jnp.zeros((8, 128))))
        rtt = (time.time() - t0) / 3
        t0 = time.time()
        for it in range(ITERS):
            d_f, i_f = fn(qs[it], x, xn)
        _ = np.asarray(d_f)
        el = max(time.time() - t0 - rtt, 1e-9)
        print(f"fused phase-2: {el/ITERS*1e3:.2f} ms/dispatch, "
              f"{ITERS*Q/el/1e3:.1f}k QPS", flush=True)


if __name__ == "__main__":
    main()
