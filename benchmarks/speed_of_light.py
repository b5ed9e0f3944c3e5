"""Speed-of-light accounting for the headline dispatch (VERDICT r3 #7).

The pinned operating point (1M x 128 bf16, Q=2048, k=10, margin 2, fused
phase 2, certificate on) dispatches in ~8.1 ms — ~2x the naive
compute/bandwidth floor. Every cheap knob has a recorded negative
(BENCH_NOTES: int8 DMAs, qb, norm-DMA elimination, subgroup mins, hier
select, in-kernel chunk overlap, Q=4096). This script produces the final
accounting:

  1. re-measures the stage splits at HEAD (sweep-only / sweep+select /
     full) with the truncated-program method of gather_kernel_sweep2
     (never time phase 1 by returning its 64 MB mins buffer — it gets
     relaid out as a program result and reads 3.5x slow);
  2. runs the ONE untried idea — cross-dispatch pipelining: two
     interleaved half-Q dispatch chains, hoping dispatch i's DMA-bound
     phase 2 overlaps dispatch i+1's MXU-bound phase 1. A TPU core
     executes one program at a time (no concurrent kernel execution), so
     the expectation is NO overlap — this measurement closes the idea
     with data either way;
  3. prints the named-terms table for BENCH_NOTES.

    python benchmarks/speed_of_light.py [--dispatches 40]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

import numpy as np

N = 1_000_000
D = 128
K = 10
MARGIN = 2
TILE_N = 4096
QB = 32  # bench.py's batched operating point


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dispatches", type=int, default=40)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from gather_kernel_sweep2 import build_variant
    from image_search_engine_tpu.ops.topk_pallas import topk_twophase

    assert jax.default_backend() == "tpu", "run on the chip"
    tiny = jax.jit(lambda v: v + 1.0)
    _ = np.asarray(tiny(jnp.zeros((8, 128))))
    t0 = time.time()
    for _ in range(3):
        _ = np.asarray(tiny(jnp.zeros((8, 128))))
    rtt = (time.time() - t0) / 3
    print(f"tunnel RTT {rtt*1e3:.0f} ms", flush=True)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((N, D), np.float32), jnp.bfloat16)
    norms = jnp.sum(x.astype(jnp.float32) * x, axis=1)
    q2048 = jnp.asarray(rng.standard_normal((2048, D), np.float32),
                        jnp.bfloat16)
    qa = jnp.asarray(rng.standard_normal((1024, D), np.float32), jnp.bfloat16)
    qb_ = jnp.asarray(rng.standard_normal((1024, D), np.float32), jnp.bfloat16)
    x, norms, q2048, qa, qb_ = jax.device_put((x, norms, q2048, qa, qb_))

    def timeit(name, fn, argsets, queries_per_round):
        for a in argsets:
            jax.tree_util.tree_map(np.asarray, fn(*a))  # compile + settle
        t0 = time.time()
        outs = None
        for _ in range(args.dispatches):
            outs = [fn(*a) for a in argsets]
        _ = np.asarray(jax.tree_util.tree_leaves(outs[-1])[0])[:1]
        el = (time.time() - t0 - rtt) / args.dispatches
        print(f"{name}: {el*1e3:.2f} ms/round "
              f"({queries_per_round/el/1e3:.1f}k QPS)", flush=True)
        return el

    # --- stage splits at HEAD (truncated programs) -------------------------
    sweep = build_variant(N, D, TILE_N, MARGIN, stop_after="sweep")
    sel = build_variant(N, D, TILE_N, MARGIN, stop_after="select")
    t_sweep = timeit("sweep-only (truncated)", jax.jit(sweep),
                     [(q2048, x, norms)], 2048)
    t_sel = timeit("sweep+select (truncated)", jax.jit(sel),
                   [(q2048, x, norms)], 2048)

    @jax.jit
    def full(qf):
        return topk_twophase(qf, x, K, "l2", x_norms=norms, tile_n=TILE_N,
                             t_margin=MARGIN, fused_rescore=True, qb=QB,
                             with_certificate=True)

    t_full = timeit("full production Q=2048", full, [(q2048,)], 2048)
    cert = np.asarray(full(q2048)[2])
    print(f"  certified: {cert.mean()*100:.1f}%", flush=True)

    # --- cross-dispatch pipelining probe -----------------------------------
    @jax.jit
    def full_half(qf):
        return topk_twophase(qf, x, K, "l2", x_norms=norms, tile_n=TILE_N,
                             t_margin=MARGIN, fused_rescore=True, qb=QB,
                             with_certificate=True)

    t_half = timeit("single chain Q=1024", full_half, [(qa,)], 1024)
    t_int = timeit("two interleaved chains Q=1024+1024", full_half,
                   [(qa,), (qb_,)], 2048)

    # --- accounting --------------------------------------------------------
    BF16_TFLOPS = 197e12  # v5e MXU peak, bf16
    HBM_GBS = 819e9
    t = K + MARGIN
    mxu_ms = 2 * 2048 * N * D / BF16_TFLOPS * 1e3
    sweep_stream_ms = N * D * 2 / HBM_GBS * 1e3
    mins_ms = (N // 128) * 2048 * 4 / HBM_GBS * 1e3  # write + read of mins
    gather_bytes = 2048 * t * 128 * 128 * 2
    gather_ms = gather_bytes / HBM_GBS * 1e3
    print("\n--- speed-of-light table (ms at Q=2048) ---", flush=True)
    print(f"phase-1 sweep measured            {t_sweep*1e3:8.2f}")
    print(f"  MXU floor (2QNd @ {BF16_TFLOPS/1e12:.0f} TF bf16) "
          f"{mxu_ms:8.2f}")
    print(f"  HBM store stream floor          {sweep_stream_ms:8.2f}")
    print(f"  mins buffer write+read          {mins_ms:8.2f}")
    print(f"  -> formulation overhead         {t_sweep*1e3-mxu_ms:8.2f} "
          f"(MXU util {mxu_ms/(t_sweep*1e3)*100:.0f}%; in-kernel overlap "
          f"negative: sweep_chunked)")
    print(f"select measured                   {(t_sel-t_sweep)*1e3:8.2f} "
          f"(hier-select negative)")
    print(f"phase-2 + final top-k measured    {(t_full-t_sel)*1e3:8.2f}")
    print(f"  gather BW floor ({gather_bytes/1e6:.0f} MB)       "
          f"{gather_ms:8.2f}")
    print(f"  -> DMA-issue/grid residual      "
          f"{(t_full-t_sel)*1e3-gather_ms:8.2f} (Q*t={2048*t} block DMAs; "
          f"int8/qb/norm-DMA negatives)")
    print(f"full dispatch                     {t_full*1e3:8.2f}")
    print(f"\ninterleaved chains: {2048/t_int/1e3:.1f}k QPS vs Q=2048 "
          f"single {2048/t_full/1e3:.1f}k QPS vs 2x single-half "
          f"{1024/t_half/1e3:.1f}k QPS each", flush=True)


if __name__ == "__main__":
    main()
