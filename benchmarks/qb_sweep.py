"""Sweep the fused phase-2 kernel's query-block size (qb) at the headline
operating point. qb sets the 2-D grid's step count (qp/qb * t) and the
DMAs issued per step (qb vector blocks): total DMA count is fixed at Q*t,
so if the binding term is per-GRID-STEP overhead rather than per-DMA
issue, larger qb should pay. BENCH_NOTES "Phase-2 DMA-issue variants"
measured the phase at ~3.9 ms of the 8.26 ms dispatch.

    python benchmarks/qb_sweep.py [--dispatches 100]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

N = 1_000_000
D = 128
Q = 2048
K = 10


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dispatches", type=int, default=100)
    ap.add_argument("--qbs", type=int, nargs="*", default=[4, 8, 16, 32])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from image_search_engine_tpu.ops.topk_pallas import topk_twophase

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

    ref_ids = None
    for qb in args.qbs:
        d, i, cert = topk_twophase(
            q, x, K, "l2", x_norms=norms, t_margin=2, fused_rescore=True,
            qb=qb, with_certificate=True)
        ids = np.asarray(i)
        if ref_ids is None:
            ref_ids = ids
        same = (ids == ref_ids).all()
        t0 = time.time()
        for _ in range(args.dispatches):
            out = topk_twophase(
                q, x, K, "l2", x_norms=norms, t_margin=2,
                fused_rescore=True, qb=qb, with_certificate=True)
        _ = np.asarray(out[2])[:1]
        el = (time.time() - t0 - rtt) / args.dispatches
        print(f"qb={qb}: {el*1e3:.2f} ms/dispatch ({Q/el/1e3:.1f}k QPS) "
              f"cert={np.asarray(out[2]).mean()*100:.0f}% "
              f"ids={'OK' if same else 'MISMATCH'}", flush=True)


if __name__ == "__main__":
    main()
