"""Local-descriptor extraction throughput on the chip (BoVW front end).

The reference's ORB/SIFT/BRISK/DAISY run one image at a time through
OpenCV/skimage on CPU threads (descriptors.py:125-129, 232-254); here each
family is a single batched jitted program. Reports images/s with
device-resident inputs (dispatch-pipeline protocol: host uploads through a
dev tunnel would otherwise dominate, as with the CNN path).

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

    from image_search_engine_tpu.config import Config, CornerDescriptorKind, Method
    from image_search_engine_tpu.descriptors import make_descriptor

    rng = np.random.default_rng(0)
    imgs = rng.random((args.iters, args.batch, args.size, args.size, 3)).astype(np.float32)

    tiny = jax.jit(lambda v: v + 1.0)
    _ = np.asarray(tiny(jnp.zeros((8, 128))))
    t0 = time.time()
    for _ in range(3):
        _ = np.asarray(tiny(jnp.zeros((8, 128))))
    rtt = (time.time() - t0) / 3

    for kind in ("orb", "sift", "brisk", "daisy"):
        cfg = Config(
            method=Method.BOVW, corner_descriptor=CornerDescriptorKind(kind),
            resize_size=args.size, max_descriptors_per_image=args.max_keypoints,
        )
        desc = make_descriptor(cfg)
        staged = [jnp.asarray(imgs[i]) for i in range(args.iters)]
        for s in staged:
            s.block_until_ready()
        try:
            t0 = time.time()
            f, v = desc.describe_batch(staged[0])
            f = np.asarray(f)
            compile_s = time.time() - t0
            t0 = time.time()
            for i in range(args.iters):
                f, v = desc.describe_batch(staged[i])
            _ = np.asarray(f)
            elapsed = max(time.time() - t0 - rtt, 1e-9)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"descriptor": kind, "error": str(e)[:160]}), flush=True)
            continue
        print(json.dumps({
            "descriptor": kind,
            "images_per_s": round(args.iters * args.batch / elapsed, 1),
            "ms_per_batch": round(1000 * elapsed / args.iters, 2),
            "desc_shape": list(np.asarray(f).shape[1:]),
            "compile_s": round(compile_s, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
