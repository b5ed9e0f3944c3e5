"""Validate + time the productionized fused phase-2 path (topk_twophase
with fused_rescore=True) at the headline operating point.

Checks margin cleanliness (m2/m3 vs m6 over ITERS*Q queries) and recall
vs f32 brute force on the production code path, then times m2.

    python benchmarks/fused_production.py
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
    xn = jnp.asarray(np.sum(xb32 * xb32, axis=1))  # bf16-store-true norms
    qh = rng.standard_normal((ITERS, Q, D)).astype(np.float32)
    qs = [jnp.asarray(qh[i]) for i in range(ITERS)]

    def fn(q, m):
        return topk_twophase(q, x, K, "l2", x_norms=xn, tile_n=TILE_N,
                             t_margin=m, fused_rescore=True)

    # recall vs f32 brute force (first 256 queries of the first dispatch;
    # the full-dispatch (Q, N) distance matrix is 8 GB of host RAM)
    q0 = qh[0][:256]
    d_full = (q0**2).sum(1)[:, None] - 2.0 * q0 @ xh.T + (xh**2).sum(1)[None, :]
    ref = np.argpartition(d_full, K, axis=1)[:, :K]
    i2 = np.asarray(fn(qs[0], 2)[1])[:256]
    rec = float(np.mean([len(set(a) & set(b)) / K
                         for a, b in zip(i2.tolist(), ref.tolist())]))
    print(f"fused m2 recall@10 vs f32 brute = {rec:.5f}", flush=True)

    # margin validation: m2/m3 vs m6 over all dispatches
    for m in (2, 3):
        mism = 0
        for it in range(ITERS):
            i6 = np.asarray(fn(qs[it], 6)[1])
            im = np.asarray(fn(qs[it], m)[1])
            mism += int((~(np.sort(i6, 1) == np.sort(im, 1)).all(1)).sum())
        print(f"validation m{m} vs m6: {mism} / {ITERS*Q}", flush=True)

    # timing protocol (see bench.py docstring)
    tiny = jax.jit(lambda v: v + 1.0)
    _ = np.asarray(tiny(jnp.zeros((8, 128))))
    t0 = time.time()
    for _ in range(3):
        _ = np.asarray(tiny(jnp.zeros((8, 128))))
    rtt = (time.time() - t0) / 3
    for m in (2, 3):
        d, i = fn(qs[0], m)
        _ = np.asarray(d)
        t0 = time.time()
        for it in range(ITERS):
            d, i = fn(qs[it], m)
        _ = np.asarray(d)
        el = max(time.time() - t0 - rtt, 1e-9)
        print(f"fused m{m}: {el/ITERS*1e3:.2f} ms/dispatch, "
              f"{ITERS*Q/el/1e3:.1f}k QPS", flush=True)


if __name__ == "__main__":
    main()
