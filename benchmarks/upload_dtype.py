"""Host->device transfer cost of the indexing path: uint8 vs float32 batches.

The corpus loader now keeps pixels uint8 and the device casts to [0,1]
(ops/image_ops.to_unit_f32) — a 4x cut in upload bytes. This measures the
end-to-end embed_batch wall time (upload + forward + readback) for both
host dtypes. Through this dev tunnel (~27 MB/s) the upload dominates and
the effect is large; on local PCIe hardware the same ratio applies to the
transfer term only.

    python benchmarks/upload_dtype.py [--model resnet50] [--batch 64] [--iters 4]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="resnet50")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--size", type=int, default=224)
    ap.add_argument("--iters", type=int, default=4)
    args = ap.parse_args()

    from image_search_engine_tpu.models.embedder import CNNEmbedder

    rng = np.random.default_rng(0)
    u8 = rng.integers(0, 256, (args.batch, args.size, args.size, 3), dtype=np.uint8)
    f32 = u8.astype(np.float32) / 255.0

    emb = CNNEmbedder(args.model, image_size=args.size, batch_size=args.batch)

    for name, x in (("f32", f32), ("u8", u8)):
        out = emb.embed_batch(x)  # compile + warm
        t0 = time.time()
        for _ in range(args.iters):
            out2 = emb.embed_batch(x)
        dt = (time.time() - t0) / args.iters
        assert np.allclose(out, out2, rtol=1e-4, atol=1e-5)
        print(json.dumps({
            "host_dtype": name,
            "ms_per_batch": round(1000 * dt, 1),
            "images_per_s": round(args.batch / dt, 1),
            "upload_mb": round(x.nbytes / 1e6, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
