"""IVF at 1M-vector scale on the chip: single-query latency and batched
QPS vs the exact two-phase sweep, with recall@10 against exact search.

On TPU the exact sweep amortizes one store stream across the whole query
batch, so for large batches it wins on throughput; IVF's per-query probed
gathers don't amortize but touch ~nprobe/nlist of the corpus, so it wins
single-query LATENCY. This harness measures both regimes (the numbers
behind that design guidance in BENCH_NOTES).

    python benchmarks/ivf_1m.py [--n 1000000] [--nlist 1024]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--d", type=int, default=128)
    ap.add_argument("--nlist", type=int, default=1024)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--table-dtype", choices=["f32", "bf16"], default="f32")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from image_search_engine_tpu.index.ivf import IVFIndex, _ivf_search_kernel
    from image_search_engine_tpu.ops.topk_pallas import topk_twophase

    rng = np.random.default_rng(0)
    # clustered corpus (IVF's regime): 4096 natural clusters
    centers = rng.standard_normal((4096, args.d)).astype(np.float32) * 3
    reps = args.n // 4096
    x = np.concatenate(
        [c + rng.standard_normal((reps, args.d)).astype(np.float32) for c in centers]
    )[: args.n]
    q_all = x[rng.choice(args.n, 512, replace=False)] + 0.1 * rng.standard_normal(
        (512, args.d)).astype(np.float32)

    # exact reference on device (bf16 two-phase; recall 1.0 vs f64 measured)
    xb = jnp.asarray(x, jnp.bfloat16)
    xn = jnp.asarray((x.astype(np.float64) ** 2).sum(1).astype(np.float32))
    d_e, exact_ids = topk_twophase(jnp.asarray(q_all), xb, args.k, "l2",
                                   x_norms=xn, tile_n=4096)
    exact_ids = np.asarray(exact_ids)

    t0 = time.time()
    ivf = IVFIndex(nlist=args.nlist, nprobe=8, table_dtype=args.table_dtype).add(x)
    build_s = time.time() - t0

    # RTT
    tiny = jax.jit(lambda v: v + 1.0)
    _ = np.asarray(tiny(jnp.zeros((8, 128))))
    t0 = time.time()
    for _ in range(3):
        _ = np.asarray(tiny(jnp.zeros((8, 128))))
    rtt = (time.time() - t0) / 3

    bcents, lists, valid, packed, pnorms = ivf._device_arrays()
    max_list = ivf.lists.shape[1]
    nbuckets = ivf.lists.shape[0]

    results = [{"metric": "ivf_build_s_1M", "value": round(build_s, 2),
                "nlist": args.nlist, "cap": int(max_list),
                "nbuckets": int(nbuckets)}]
    for nprobe in (4, 8, 16):
        for q_batch in (1, 256):
            qs = [jnp.asarray(q_all[(i * q_batch) % 500:][:q_batch])
                  for i in range(args.iters)]
            ivf.nprobe = nprobe
            npb = ivf._effective_nprobe()
            k_eff = min(args.k, npb * max_list)

            def search(qq, npb=npb, ke=k_eff):
                return _ivf_search_kernel(
                    qq, bcents, lists, valid, packed, pnorms, ke, npb, max_list)

            dd, ii, ok = search(qs[0])
            _ = np.asarray(dd)
            t0 = time.time()
            for i in range(args.iters):
                dd, ii, ok = search(qs[i])
            _ = np.asarray(dd)
            elapsed = max(time.time() - t0 - rtt, 1e-9)

            got = np.asarray(search(jnp.asarray(q_all[:64]))[1])
            recall = float(np.mean([
                len(set(a.tolist()) & set(b.tolist())) / args.k
                for a, b in zip(got, exact_ids[:64])
            ]))
            results.append({
                "nlist": args.nlist, "nprobe": nprobe, "Q": q_batch,
                "ms_per_call": round(1000 * elapsed / args.iters, 3),
                "qps": round(args.iters * q_batch / elapsed, 1),
                "recall@10_vs_exact": round(recall, 4),
                "scan_fraction": round(nprobe / args.nlist, 4),
            })
    for r in results:
        print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
