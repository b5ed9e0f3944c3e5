"""Batched IVF at 1M via the fused probed-scan kernel vs the XLA gather.

Round 1: batched IVF through the XLA gather measured "100x slower per
call" (the (Q, nprobe*cap, d) buffer) and served single-query only.
This records the kernel's batched QPS filling the latency-vs-throughput
middle ground between single-query IVF (0.56 ms) and the exact
two-phase sweep (~250k QPS at Q=2048).

    python benchmarks/ivf_batched_1m.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

N, D, NLIST, K = 1_000_000, 128, 1024, 10


def main():
    import jax
    import jax.numpy as jnp

    from image_search_engine_tpu.index.ivf import IVFIndex
    from image_search_engine_tpu.ops.topk_pallas import topk_twophase

    assert jax.default_backend() == "tpu"
    rng = np.random.default_rng(0)
    centers = rng.standard_normal((64, D)).astype(np.float32) * 3
    x = np.concatenate([
        c + rng.standard_normal((N // 64, D)).astype(np.float32) for c in centers
    ])
    q = x[rng.choice(N, 1024, replace=False)] + 0.05 * rng.standard_normal(
        (1024, D)).astype(np.float32)

    t0 = time.time()
    ivf = IVFIndex(nlist=NLIST, nprobe=4).add(x)
    print(f"build {time.time()-t0:.1f}s; buckets {ivf.lists.shape} "
          f"(cap {ivf.lists.shape[1]})", flush=True)

    # exact reference for recall
    xb = jnp.asarray(x, jnp.bfloat16)
    xn = jnp.asarray((np.asarray(xb, np.float32) ** 2).sum(1))
    _, ei = topk_twophase(jnp.asarray(q[:256]), xb, K, "l2", x_norms=xn,
                          tile_n=4096, t_margin=2)[:2]

    for qn in (64, 256, 1024):
        d, i = ivf.search_batched(q[:qn], K)  # compile per Q
        reps = 5
        t0 = time.time()
        for _ in range(reps):
            d, i = ivf.search_batched(q[:qn], K)
        el = (time.time() - t0) / reps
        print(f"fused probed-scan Q={qn}: {el*1e3:.1f} ms/batch -> "
              f"{qn/el/1e3:.1f}k QPS", flush=True)

    _, bi = ivf.search_batched(q[:256], K)
    rec = np.mean([len(set(a) & set(b)) / K
                   for a, b in zip(np.asarray(bi).tolist(),
                                   np.asarray(ei).tolist())])
    print(f"recall@10 vs exact (nprobe=4): {rec:.3f}", flush=True)

    # single-query comparison point (the round-1 serving regime)
    d, i = ivf.search(q[:1], K)
    t0 = time.time()
    for _ in range(20):
        d, i = ivf.search(q[:1], K)
    print(f"single-query XLA path: {(time.time()-t0)/20*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
