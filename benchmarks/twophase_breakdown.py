"""Where do the headline dispatch's milliseconds go? Phase-level breakdown
of ``topk_twophase`` at the pinned operating point (1M x 128 bf16, Q=2048,
k=10, margin 2, fused, cert on), plus a 2-D-grid phase-1 variant.

Motivation: at the headline point the full dispatch measures ~8.4 ms.
The phase-2 fused rescore accounts for ~3.4 ms (BENCH_NOTES "Phase-2
DMA-issue variants"), leaving ~5 ms for phase 1 + the candidate select —
but the phase-1 matmul bound is ~2.7 ms (2*Q*N*d / 197 bf16 TFLOPS) and
the sweep's HBM bound is ~0.4 ms. This script times each stage as its own
program to find the slack:

  1. phase-1 group-min kernel alone (production 1-D grid, tile_n=4096);
  2. phase-1 variant: 2-D grid (n_tiles outer, query-blocks inner) so the
     scores intermediate shrinks from (2048, 4096) f32 = 32 MB VMEM to
     (qblk, 4096) — candidate win if Mosaic pipelines the smaller buffer
     better (store is still streamed exactly once: x tile is resident per
     outer step, query blocks cycle in the inner dim);
  3. phase-1 + the candidate top_k select over (Q, ngroups) mins;
  4. the full production dispatch (reference point).

Protocol: device-resident inputs, N dependent-free dispatches, one
readback, RTT subtracted (CLAUDE.md benchmark protocol).

    python benchmarks/twophase_breakdown.py [--dispatches 50]
"""

from __future__ import annotations

import argparse
import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

N = 1_000_000
D = 128
Q = 2048
K = 10
TILE_N = 4096
MARGIN = 2


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dispatches", type=int, default=50)
    ap.add_argument("--qblks", type=int, nargs="*", default=[256, 512])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from image_search_engine_tpu.ops.topk_pallas import (
        GROUP,
        _groupmin_kernel,
        topk_twophase,
    )

    assert jax.default_backend() == "tpu"
    tiny = jax.jit(lambda v: v + 1.0)
    _ = np.asarray(tiny(jnp.zeros((8, 128))))
    t0 = time.time()
    for _ in range(3):
        _ = np.asarray(tiny(jnp.zeros((8, 128))))
    rtt = (time.time() - t0) / 3
    print(f"tunnel RTT {rtt*1e3:.0f} ms", flush=True)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((N, D), np.float32), jnp.bfloat16)
    q = jnp.asarray(rng.standard_normal((Q, D), np.float32), jnp.bfloat16)
    norms = jnp.sum(x.astype(jnp.float32) * x, axis=1)
    x, q, norms = jax.device_put((x, q, norms))

    ngroups = N // GROUP

    def timeit(name, fn, *a):
        out = fn(*a)  # compile
        jax.tree_util.tree_map(np.asarray, out)
        t0 = time.time()
        outs = [fn(*a) for _ in range(args.dispatches)]
        # drain: one small readback from the last output
        _ = np.asarray(jax.tree_util.tree_leaves(outs[-1])[0])[:1]
        el = (time.time() - t0 - rtt) / args.dispatches
        print(f"{name}: {el*1e3:.2f} ms/dispatch ({Q/el/1e3:.1f}k QPS)",
              flush=True)
        return outs[-1], el

    # --- 1. production phase-1 kernel alone (mirrors topk_twophase's
    # bf16 branch exactly: same specs, same vmem limit) ---
    out_spec = pl.BlockSpec((TILE_N // GROUP, Q), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((ngroups, Q), jnp.float32)
    vmem_bytes = min(
        int(1.5 * (Q * TILE_N * 4 + 2 * TILE_N * D * 2 + Q * D * 4)) + (1 << 20),
        112 * (1 << 20),
    )

    @jax.jit
    def phase1_prod(qf, nrm, xf):
        return pl.pallas_call(
            functools.partial(_groupmin_kernel, tile_n=TILE_N),
            grid=(N // TILE_N,),
            in_specs=[
                pl.BlockSpec((Q, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((TILE_N,), lambda i: (i,), memory_space=pltpu.VMEM),
                pl.BlockSpec((TILE_N, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=out_spec,
            out_shape=out_shape,
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_bytes),
        )(qf, nrm, xf)

    mins_prod, t_p1 = timeit("phase1 1-D grid (production)", phase1_prod,
                             q, norms, x)

    # --- 2. 2-D grid variant: n tiles outer (store streamed once),
    # query blocks inner (x tile resident across the inner dim) ---
    def make_phase1_2d(qblk):
        @jax.jit
        def phase1_2d(qf, nrm, xf):
            return pl.pallas_call(
                functools.partial(_groupmin_kernel, tile_n=TILE_N),
                grid=(N // TILE_N, Q // qblk),
                in_specs=[
                    pl.BlockSpec((qblk, D), lambda i, j: (j, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((TILE_N,), lambda i, j: (i,),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((TILE_N, D), lambda i, j: (i, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((TILE_N // GROUP, qblk),
                                       lambda i, j: (i, j),
                                       memory_space=pltpu.VMEM),
                out_shape=out_shape,
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=min(
                        int(1.5 * (qblk * TILE_N * 4 + 2 * TILE_N * D * 2
                                   + qblk * D * 4)) + (1 << 20),
                        112 * (1 << 20),
                    )
                ),
            )(qf, nrm, xf)
        return phase1_2d

    for qblk in args.qblks:
        mins_2d, _ = timeit(f"phase1 2-D grid qblk={qblk}",
                            make_phase1_2d(qblk), q, norms, x)
        same = np.allclose(np.asarray(mins_2d), np.asarray(mins_prod),
                           rtol=1e-5, atol=1e-5)
        print(f"  parity vs production: {'OK' if same else 'MISMATCH'}",
              flush=True)

    # --- 3. phase 1 + candidate select (top_k over (Q, ngroups)) ---
    t = K + MARGIN

    @jax.jit
    def phase1_select(qf, nrm, xf):
        mins = phase1_prod(qf, nrm, xf).T  # (Q, ngroups)
        _, cand = jax.lax.top_k(-mins, t)
        return cand

    _, t_sel = timeit("phase1 + candidate top_k", phase1_select, q, norms, x)
    print(f"  -> select stage alone ~{(t_sel - t_p1)*1e3:.2f} ms", flush=True)

    # --- 4. full production dispatch ---
    @jax.jit
    def full(qf, xf, nrm):
        return topk_twophase(qf, xf, K, "l2", x_norms=nrm, tile_n=TILE_N,
                             t_margin=MARGIN, fused_rescore=True,
                             with_certificate=True)

    (_, _, cert), t_full = timeit("full topk_twophase (headline)", full,
                                  q, x, norms)
    print(f"  certified: {np.asarray(cert).mean()*100:.1f}%", flush=True)
    print(f"  -> phase-2 fused rescore ~{(t_full - t_sel)*1e3:.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
