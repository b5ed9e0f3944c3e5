"""CNN embedding throughput: images/s through the batched embedder (the
reference ran ResNet-50 at batch size 1, descriptors.py:181-204).

    python benchmarks/embed_throughput.py [--model resnet50] [--batch 64]
"""
import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="resnet50")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--size", type=int, default=224)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    import jax

    from image_search_engine_tpu.models.embedder import CNNEmbedder

    emb = CNNEmbedder(args.model, image_size=args.size, batch_size=args.batch)
    rng = np.random.default_rng(0)
    imgs = rng.random((args.batch, args.size, args.size, 3)).astype(np.float32)

    _ = emb.embed_batch(imgs)  # compile
    t0 = time.time()
    for _ in range(args.iters):
        out = emb.embed_batch(imgs)
    el = (time.time() - t0) / args.iters
    print(f"{args.model} batch={args.batch}: {el*1e3:.1f} ms/batch -> "
          f"{args.batch/el:.0f} images/s on {jax.default_backend()} "
          f"(embeddings {out.shape})")


if __name__ == "__main__":
    main()
