"""BASELINE config #3 end-to-end: BoVW SIFT/DAISY + tf-idf (BM25) weighted
histograms searched with chi-square and cosine distance — the whole path on
the chip, timed stage by stage.

The reference runs this stack as OpenCV/skimage descriptors on CPU threads
-> faiss.Kmeans codebook -> np.histogram loops -> sklearn OkapiTransformer
-> faiss flat search (backend/bag_of_visual_words.py, utils.py:100-219,
293-330). Here every stage is a batched jitted program; this script
measures each and checks retrieval quality on a grouped synthetic corpus
(group members must retrieve each other).

    python benchmarks/bovw_e2e.py [--images 512] [--clusters 200]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def make_grouped_images(n_groups: int, per_group: int, size: int, seed: int = 0):
    """Smooth random images in visual groups (low-res bases, bilinear up)."""
    rng = np.random.default_rng(seed)
    base_lr = rng.random((n_groups, 8, 8, 3)).astype(np.float32)
    imgs = np.empty((n_groups * per_group, size, size, 3), np.float32)
    labels = np.empty(n_groups * per_group, np.int32)
    import jax
    import jax.numpy as jnp

    up = jax.jit(lambda lo: jax.image.resize(lo, (lo.shape[0], size, size, 3), "bilinear"))
    k = 0
    for g in range(n_groups):
        variants = base_lr[g][None] + 0.10 * rng.random((per_group, 8, 8, 3)).astype(np.float32)
        hi = np.asarray(up(jnp.asarray(np.clip(variants, 0, 1))))
        for m in range(per_group):
            imgs[k] = hi[m]
            labels[k] = g
            k += 1
    return imgs, labels


def make_textured_images(n_groups: int, per_group: int, size: int, seed: int = 0):
    """Textured grouped corpus: sharp random blob patterns (nearest-neighbor
    upscale -> corners everywhere) with per-variant similarity transforms
    (scale 0.9-1.1, rotation +-5deg, small shift) and photometric jitter.
    The smooth corpus barely fires corner detectors (round-1 numbers
    conflated descriptor quality with corpus texture, VERDICT r1 weak #5);
    this is the honest test for the keypoint families, and the re-scaled
    variants are what the multi-scale pyramid exists for."""
    rng = np.random.default_rng(seed)
    import jax
    import jax.numpy as jnp

    from image_search_engine_tpu.training.siamese.augmentations import _affine_sample

    base = (rng.random((n_groups, 28, 28, 1)) > 0.5).astype(np.float32)
    base = base * rng.random((n_groups, 28, 28, 1)).astype(np.float32)
    up = jax.jit(lambda lo: jax.image.resize(
        lo, (lo.shape[0], size, size, 1), "nearest"))
    hi = np.asarray(up(jnp.asarray(base)))  # (G, S, S, 1) sharp patterns

    def mat(scale, theta, ty, tx):
        c = (size - 1) / 2.0
        cos_t, sin_t = np.cos(theta) / scale, np.sin(theta) / scale
        return np.array([
            [cos_t, -sin_t, c - cos_t * c + sin_t * c + ty],
            [sin_t, cos_t, c - sin_t * c - cos_t * c + tx],
        ], np.float32)

    warp = jax.jit(lambda im, m: _affine_sample(im, m, fill=0.5))
    imgs = np.empty((n_groups * per_group, size, size, 3), np.float32)
    labels = np.empty(n_groups * per_group, np.int32)
    k = 0
    for g in range(n_groups):
        for m in range(per_group):
            s = rng.uniform(0.9, 1.1)
            th = rng.uniform(-0.09, 0.09)
            ty, tx = rng.uniform(-5, 5, 2)
            w = np.asarray(warp(jnp.asarray(hi[g]), jnp.asarray(mat(s, th, ty, tx))))
            img = w[..., 0] * rng.uniform(0.7, 1.0) + rng.uniform(0, 0.15)
            img = img + 0.02 * rng.standard_normal(img.shape)
            imgs[k] = np.clip(img, 0, 1)[..., None].repeat(3, axis=-1)
            labels[k] = g
            k += 1
    return imgs, labels


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=512)
    ap.add_argument("--per-group", type=int, default=4)
    ap.add_argument("--size", type=int, default=224)
    ap.add_argument("--clusters", type=int, default=200)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--descriptors", nargs="+", default=["daisy", "sift"])
    ap.add_argument("--corpus", choices=["smooth", "textured"], default="smooth")
    args = ap.parse_args()

    import jax

    from image_search_engine_tpu.bovw.pipeline import BoVWPipeline
    from image_search_engine_tpu.descriptors import CornerDescriptor, DaisyDescriptor
    from image_search_engine_tpu.index.flat import FlatIndex

    n_groups = args.images // args.per_group
    maker = make_textured_images if args.corpus == "textured" else make_grouped_images
    imgs, labels = maker(n_groups, args.per_group, args.size)
    n = imgs.shape[0]

    for kind in args.descriptors:
        desc = (DaisyDescriptor() if kind == "daisy"
                else CornerDescriptor(kind, max_keypoints=256))

        # -- stage 1: batched descriptor extraction on device ---------------
        # warm (compile) on one batch, then time the full corpus
        _ = desc.describe_batch(imgs[: args.batch])
        t0 = time.time()
        feats, valids = [], []
        for s in range(0, n, args.batch):
            f, v = desc.describe_batch(imgs[s : s + args.batch])
            feats.append(f)
            valids.append(v)
        t_desc = time.time() - t0
        features = np.concatenate(feats)
        valid = np.concatenate(valids)

        # -- stage 2: codebook + BM25 fit ------------------------------------
        t0 = time.time()
        pipe = BoVWPipeline(n_clusters=args.clusters, descriptor_kind=kind)
        pipe.fit(features, valid)
        t_fit = time.time() - t0

        # -- stage 3: corpus histograms ---------------------------------------
        t0 = time.time()
        hist = pipe.transform(features, valid)
        t_hist = time.time() - t0

        for metric in ("chi2", "cosine"):
            index = FlatIndex(metric).add(hist)
            # self-match + group retrieval on every image as query
            t0 = time.time()
            d, i = index.search(hist, args.per_group)
            t_query = time.time() - t0
            i = np.asarray(i)
            self_top1 = float(np.mean(i[:, 0] == np.arange(n)))
            # precision@(per_group-1) over the non-self ranks
            prec = float(np.mean(labels[i[:, 1:]] == labels[:, None]))
            print(json.dumps({
                "config": "bovw_e2e",
                "corpus": args.corpus,
                "descriptor": kind,
                "dims": int(features.shape[-1]),
                "metric": metric,
                "images": n,
                "clusters": args.clusters,
                "describe_img_per_s": round(n / t_desc, 1),
                "codebook_fit_s": round(t_fit, 2),
                "corpus_histograms_s": round(t_hist, 2),
                "query_all_s": round(t_query, 3),
                "self_top1": self_top1,
                "group_precision": round(prec, 4),
                "backend": jax.default_backend(),
            }), flush=True)


if __name__ == "__main__":
    main()
