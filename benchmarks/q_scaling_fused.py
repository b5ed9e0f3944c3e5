"""Queries-per-dispatch scaling with the FUSED phase 2.

The Q=2048 knee (benchmarks/q_scaling.py) was measured with the old
gather-buffer phase 2, whose per-query gather cost dominated small Q. The
fused kernel removed that term, and at Q=2048 phase 1 is MXU-bound
(Q*N*d*2 = 5.2e11 FLOPs ~ 2.7 ms at v5e bf16 peak), so the optimum may
have moved DOWN: the compute/bandwidth balance point is Q ~ 240
(256 MB sweep / 819 GB/s ~ FLOPs / 197 TF).

    python benchmarks/q_scaling_fused.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

N, D, K, TILE_N = 1_000_000, 128, 10, 4096


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

    tiny = jax.jit(lambda v: v + 1.0)
    _ = np.asarray(tiny(jnp.zeros((8, 128))))
    t0 = time.time()
    for _ in range(3):
        _ = np.asarray(tiny(jnp.zeros((8, 128))))
    rtt = (time.time() - t0) / 3

    for Q in (256, 512, 1024):
        iters = max(20, 4096 // Q * 10)  # enough dispatches to swamp overhead
        qh = rng.standard_normal((iters, Q, D)).astype(np.float32)
        qs = [jnp.asarray(qh[i]) for i in range(iters)]

        def fn(q):
            return topk_twophase(q, x, K, "l2", x_norms=xn, tile_n=TILE_N,
                                 t_margin=2)
        d, i = fn(qs[0])
        _ = np.asarray(d)
        t0 = time.time()
        for it in range(iters):
            d, i = fn(qs[it])
        _ = np.asarray(d)
        el = max(time.time() - t0 - rtt, 1e-9)
        print(f"bf16 fused m2 Q={Q}: {el/iters*1e3:.2f} ms/dispatch, "
              f"{iters*Q/el/1e3:.1f}k QPS", flush=True)


if __name__ == "__main__":
    main()
