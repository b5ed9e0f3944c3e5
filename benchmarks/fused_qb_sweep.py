"""qb (query rows per fused-rescore grid step) sweep at the headline
operating point. With the gather buffer gone, the two-phase search is
grid-step/DMA-issue bound, not bandwidth bound (int8's 2-4x byte cut
measured SLOWER than bf16: 239.7k vs 258.6k) — so fewer, bigger steps
may pay: steps = (Q/qb) * t, DMAs per step = qb.

    python benchmarks/fused_qb_sweep.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

N, D, Q, K, ITERS, TILE_N = 1_000_000, 128, 2048, 10, 20, 4096


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

    tiny = jax.jit(lambda v: v + 1.0)
    _ = np.asarray(tiny(jnp.zeros((8, 128))))
    t0 = time.time()
    for _ in range(3):
        _ = np.asarray(tiny(jnp.zeros((8, 128))))
    rtt = (time.time() - t0) / 3

    ref = None
    for qb in (16, 32):
        def fn(q):
            return topk_twophase(q, x, K, "l2", x_norms=xn, tile_n=TILE_N,
                                 t_margin=2, qb=qb)
        d, i = fn(qs[0])
        got = np.asarray(i)
        if ref is None:
            ref = got
        else:
            agree = float((np.sort(ref, 1) == np.sort(got, 1)).all(1).mean())
            print(f"qb={qb} agreement with qb=16: {agree:.4f}", flush=True)
        t0 = time.time()
        for it in range(ITERS):
            d, i = fn(qs[it])
        _ = np.asarray(d)
        el = max(time.time() - t0 - rtt, 1e-9)
        print(f"bf16 fused m2 qb={qb}: {el/ITERS*1e3:.2f} ms/dispatch, "
              f"{ITERS*Q/el/1e3:.1f}k QPS", flush=True)


if __name__ == "__main__":
    main()
