"""Is the siamese train step augmentation-bound? Time ``augment_batch``
alone, the model fwd/bwd alone, and the full train step at the reference
geometry (352x256) to locate the milliseconds.

Context: train_step_throughput.py measured bf16 ~= f32 (334 vs 337
ms/step, head-only batch 32) and batch 128 at 9x the batch-32 time —
both signatures of a step dominated by non-MXU work. The suspect is the
augmentation stack's three gather-based bilinear remap passes (affine /
perspective / optical distortion, augmentations.py): XLA lowers the
(H, W) fancy-index gathers to slow scatter/gather loops on TPU.

    python benchmarks/augment_bench.py [--steps 10]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

IMAGE_SIZE = (352, 256)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--batches", type=int, nargs="*", default=[32, 128])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import jax.random as jrandom

    from image_search_engine_tpu.training.siamese.augmentations import (
        augment_batch,
    )

    assert jax.default_backend() == "tpu"
    tiny = jax.jit(lambda v: v + 1.0)
    _ = np.asarray(tiny(jnp.zeros((8, 128))))
    t0 = time.time()
    for _ in range(3):
        _ = np.asarray(tiny(jnp.zeros((8, 128))))
    rtt = (time.time() - t0) / 3
    print(f"tunnel RTT {rtt*1e3:.0f} ms", flush=True)

    h, w = IMAGE_SIZE
    rng = np.random.default_rng(0)

    for b in args.batches:
        imgs = jax.device_put(
            jnp.asarray(rng.random((b, h, w, 3), np.float32)))
        out = augment_batch(jrandom.PRNGKey(0), imgs)  # compile
        _ = np.asarray(out[0, 0, 0])
        t0 = time.time()
        for i in range(args.steps):
            out = augment_batch(jrandom.PRNGKey(i + 1), imgs)
        _ = np.asarray(out[0, 0, 0])
        el = (time.time() - t0 - rtt) / args.steps
        print(f"augment_batch batch={b}: {el*1e3:.1f} ms "
              f"({b/el:.1f} img/s)", flush=True)


if __name__ == "__main__":
    main()
