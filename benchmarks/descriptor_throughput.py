"""Local-descriptor extraction throughput on the chip (BoVW front end).

The reference's ORB/SIFT/BRISK/DAISY run one image at a time through
OpenCV/skimage on CPU threads (descriptors.py:125-129, 232-254); here each
family is a single batched jitted program. Reports images/s with
device-resident inputs AND outputs: the timed program reduces the
descriptors to a scalar checksum on device, because reading a (B, K, D)
descriptor block back through this dev tunnel (~27 MB/s) costs ~1 s and
swamps the compute being measured (the first version of this bench did
exactly that and under-reported BRISK 10x). On local hardware that
readback is PCIe/DMA; the device-compute number is the framework claim.

    python benchmarks/descriptor_throughput.py [--batch 64] [--size 224]
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
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--size", type=int, default=224)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--max-keypoints", type=int, default=256)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from image_search_engine_tpu.ops import corners as corner_ops
    from image_search_engine_tpu.ops.daisy import daisy
    from image_search_engine_tpu.ops.image_ops import rgb_to_gray

    rng = np.random.default_rng(0)
    imgs = rng.random((args.iters, args.batch, args.size, args.size, 3)).astype(np.float32)

    tiny = jax.jit(lambda v: v + 1.0)
    _ = np.asarray(tiny(jnp.zeros((8, 128))))
    t0 = time.time()
    for _ in range(3):
        _ = np.asarray(tiny(jnp.zeros((8, 128))))
    rtt = (time.time() - t0) / 3

    def corner_step(kind):
        def step(images):
            gray = rgb_to_gray(images)
            d, valid = corner_ops.detect_and_describe(
                gray, kind, args.max_keypoints
            )
            return jnp.sum(d) + jnp.sum(valid)

        return step

    def daisy_step(images):
        return jnp.sum(daisy(rgb_to_gray(images)))

    kinds = {k: corner_step(k) for k in ("orb", "sift", "brisk")}
    kinds["daisy"] = daisy_step

    for kind, step in kinds.items():
        fn = jax.jit(step)
        staged = [jnp.asarray(imgs[i]) for i in range(args.iters)]
        for s in staged:
            s.block_until_ready()
        try:
            t0 = time.time()
            _ = np.asarray(fn(staged[0]))
            compile_s = time.time() - t0
            t0 = time.time()
            out = [fn(staged[i]) for i in range(args.iters)]
            _ = np.asarray(out[-1])  # one scalar readback drains the queue
            elapsed = max(time.time() - t0 - rtt, 1e-9)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"descriptor": kind, "error": str(e)[:160]}), flush=True)
            continue
        print(json.dumps({
            "descriptor": kind,
            "images_per_s": round(args.iters * args.batch / elapsed, 1),
            "ms_per_batch": round(1000 * elapsed / args.iters, 2),
            "compile_s": round(compile_s, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
