"""QB (queries per grid step) sweep for the fused phase-2 kernel, plus a
phase-1-only timing to split the budget. See gather_kernel_proto.py.

    python benchmarks/gather_kernel_sweep.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from benchmarks.gather_kernel_proto import K, build  # noqa: E402

N, D, Q, ITERS, TILE_N = 1_000_000, 128, 2048, 20, 4096


def main():
    import jax
    import jax.numpy as jnp

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

    def timeit(name, fn):
        d, i = fn(qs[0], x, xn)
        _ = np.asarray(d)
        t0 = time.time()
        for it in range(ITERS):
            d, i = fn(qs[it], x, xn)
        _ = np.asarray(d)
        el = max(time.time() - t0 - rtt, 1e-9)
        print(f"{name}: {el/ITERS*1e3:.2f} ms/dispatch, {ITERS*Q/el/1e3:.1f}k QPS",
              flush=True)

    timeit("phase1-only m2", build(N, D, TILE_N, 2, False, phase1_only=True))
    for qb in (16, 32):
        timeit(f"fused m2 QB={qb}", build(N, D, TILE_N, 2, False, QB=qb))
    timeit("fused m3 QB=16", build(N, D, TILE_N, 3, False, QB=16))


if __name__ == "__main__":
    main()
