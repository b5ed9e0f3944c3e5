"""IVF nlist/nprobe sweep over a 100k-vector corpus (BASELINE config #4):
recall@10 vs exact flat search and scan-fraction per operating point.

    python benchmarks/ivf_sweep.py [--n 100000] [--d 128]
"""
import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--d", type=int, default=128)
    ap.add_argument("--queries", type=int, default=64)
    ap.add_argument("--k", type=int, default=10)
    args = ap.parse_args()

    from image_search_engine_tpu.index.flat import FlatIndex
    from image_search_engine_tpu.index.ivf import IVFIndex

    rng = np.random.default_rng(0)
    # clustered corpus (IVF's intended regime)
    centers = rng.standard_normal((64, args.d)).astype(np.float32) * 3
    reps = args.n // 64
    x = np.concatenate(
        [c + rng.standard_normal((reps, args.d)).astype(np.float32) for c in centers]
    )[: args.n]
    q = x[rng.choice(args.n, args.queries, replace=False)] + 0.1 * rng.standard_normal(
        (args.queries, args.d)
    ).astype(np.float32)

    flat = FlatIndex("l2").add(x)
    _, exact_ids = flat.search(q, args.k)

    results = []
    for nlist in (16, 64, 256):
        ivf = IVFIndex(nlist=nlist, nprobe=1).add(x)
        for nprobe in (1, 2, 4, 8, min(16, nlist)):
            ivf.nprobe = min(nprobe, nlist)
            t0 = time.time()
            _, ids = ivf.search(q, args.k)
            dt = time.time() - t0
            recall = np.mean([
                len(set(a.tolist()) & set(b.tolist())) / args.k
                for a, b in zip(ids, exact_ids)
            ])
            frac = ivf.nprobe / nlist
            results.append({
                "nlist": nlist, "nprobe": ivf.nprobe,
                "recall_at_10": round(float(recall), 4),
                "scan_fraction": round(frac, 4),
                "first_call_s": round(dt, 3),
            })
            print(json.dumps(results[-1]), flush=True)


if __name__ == "__main__":
    main()
