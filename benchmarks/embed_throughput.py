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
    import jax.numpy as jnp

    from image_search_engine_tpu.models.embedder import CNNEmbedder

    emb = CNNEmbedder(args.model, image_size=args.size, batch_size=args.batch)
    rng = np.random.default_rng(0)
    imgs = rng.random((args.batch, args.size, args.size, 3)).astype(np.float32)

    # host-path number: includes host->device input transfer per batch
    # (through this dev tunnel that transfer dominates; on local hardware
    # it's PCIe/DMA)
    out = emb.embed_batch(imgs)  # compile
    t0 = time.time()
    for _ in range(args.iters):
        out = emb.embed_batch(imgs)
    host_el = (time.time() - t0) / args.iters

    # device-path number: inputs pre-staged, dependent-free dispatches,
    # one readback (the forward pass itself — what scales indexing)
    staged = [jnp.asarray(imgs + np.float32(i) * 0) for i in range(args.iters)]
    for s in staged:
        s.block_until_ready()
    e = emb._forward(emb.params, emb.batch_stats, staged[0])
    _ = np.asarray(e)
    t0 = time.time()
    for i in range(args.iters):
        e = emb._forward(emb.params, emb.batch_stats, staged[i])
    _ = np.asarray(e)
    dev_el = (time.time() - t0) / args.iters

    print(f"{args.model} batch={args.batch} on {jax.default_backend()} "
          f"(embeddings {out.shape}):")
    print(f"  host->device path: {host_el*1e3:.1f} ms/batch -> {args.batch/host_el:.0f} images/s")
    print(f"  device-resident:   {dev_el*1e3:.1f} ms/batch -> {args.batch/dev_el:.0f} images/s")


if __name__ == "__main__":
    main()
