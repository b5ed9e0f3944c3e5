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

    # compile the SAME program that is timed (niter is a static arg —
    # compiling niter=1 and timing niter=25 charged a fresh compile to
    # the old 1.29 s number), then subtract the tunnel readback RTT
    tiny = jax.jit(lambda v: v + 1.0)
    _ = np.asarray(tiny(jnp.zeros((8, 128))))
    t0 = time.time()
    for _ in range(3):
        _ = np.asarray(tiny(jnp.zeros((8, 128))))
    rtt = (time.time() - t0) / 3

    c, inertia = lloyd(x, init, args.k, niter=args.niter)  # compile + warm
    _ = np.asarray(inertia)
    reps = 3
    t0 = time.time()
    for _ in range(reps):
        c, inertia = lloyd(x, init, args.k, niter=args.niter)
    _ = np.asarray(inertia)  # one readback; device stream serialized
    el = max(time.time() - t0 - rtt, 1e-9) / reps
    print(f"{args.niter} Lloyd iters over {args.n}x{args.d}, k={args.k}: "
          f"{el:.2f}s ({el/args.niter*1e3:.1f} ms/iter) on {jax.default_backend()}; "
          f"inertia {float(inertia):.6e}")


if __name__ == "__main__":
    main()
