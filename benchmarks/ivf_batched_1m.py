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
    # 4096 tight centers — the corpus family of benchmarks/ivf_1m.py, so
    # recall numbers are comparable across rounds (64 broad clusters make
    # every true cluster span many coarse cells and IVF recall collapses
    # for structural, not implementation, reasons)
    centers = rng.standard_normal((4096, D)).astype(np.float32) * 3
    x = np.concatenate([
        c + rng.standard_normal((N // 4096, D)).astype(np.float32) for c in centers
    ])[:N]
    q = x[rng.choice(N, 1024, replace=False)] + 0.1 * rng.standard_normal(
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

    # RTT (the tunnel readback floor) measured and subtracted; QPS from
    # back-to-back dependent-free dispatches of the kernel itself
    from image_search_engine_tpu.ops.ivf_pallas import ivf_probed_topk

    tiny = jax.jit(lambda v: v + 1.0)
    _ = np.asarray(tiny(jnp.zeros((8, 128))))
    t0 = time.time()
    for _ in range(3):
        _ = np.asarray(tiny(jnp.zeros((8, 128))))
    rtt = (time.time() - t0) / 3
    nprobe_eff = ivf._effective_nprobe()
    bcents, lists, _, packed, pnorms = ivf._device_arrays()
    for qn in (64, 256, 1024):
        qj = jnp.asarray(ivf._prep(q[:qn]))
        out = ivf_probed_topk(qj, bcents, packed, pnorms, lists, K, nprobe_eff)
        _ = np.asarray(out[0])
        reps = 10
        t0 = time.time()
        for _ in range(reps):
            out = ivf_probed_topk(qj, bcents, packed, pnorms, lists, K, nprobe_eff)
        _ = np.asarray(out[0])
        el = max((time.time() - t0 - rtt) / reps, 1e-9)
        print(f"fused probed-scan Q={qn}: {el*1e3:.1f} ms/dispatch -> "
              f"{qn/el/1e3:.1f}k QPS", flush=True)

    _, bi = ivf.search_batched(q[:256], K)
    rec = np.mean([len(set(a) & set(b)) / K
                   for a, b in zip(np.asarray(bi).tolist(),
                                   np.asarray(ei).tolist())])
    print(f"recall@10 vs exact (nprobe=4): {rec:.3f}", flush=True)

    # single-query comparison point (round-1 serving regime), RTT-corrected
    d, i = ivf.search(q[:1], K)
    t0 = time.time()
    for _ in range(20):
        d, i = ivf.search(q[:1], K)
    wall = (time.time() - t0) / 20
    print(f"single-query XLA path: {wall*1e3:.2f} ms wall "
          f"(~{max(wall - 3*rtt, 0)*1e3:.2f} ms device; 3 readbacks/call)",
          flush=True)


if __name__ == "__main__":
    main()
