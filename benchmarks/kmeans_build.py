"""Codebook build-time benchmark (BASELINE tracked metric): k-means over
1M x 128 descriptors at k=512 (config #2 scale), 25 Lloyd iterations.

    python benchmarks/kmeans_build.py [--n 1000000] [--k 512]
"""
import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--d", type=int, default=128)
    ap.add_argument("--k", type=int, default=512)
    ap.add_argument("--niter", type=int, default=25)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from image_search_engine_tpu.ops.kmeans import _random_init, lloyd

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((args.n, args.d)), jnp.float32)
    init = _random_init(jax.random.PRNGKey(42), x, args.k)

    c, inertia = lloyd(x, init, args.k, niter=1)  # compile
    _ = np.asarray(inertia)
    t0 = time.time()
    c, inertia = lloyd(x, init, args.k, niter=args.niter)
    _ = np.asarray(inertia)
    el = time.time() - t0
    print(f"{args.niter} Lloyd iters over {args.n}x{args.d}, k={args.k}: "
          f"{el:.2f}s ({el/args.niter*1e3:.0f} ms/iter) on {jax.default_backend()}")


if __name__ == "__main__":
    main()
