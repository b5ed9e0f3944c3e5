"""Descriptor facade: one batched interface over every feature family.

The reference's ``SupportsDescribe`` protocol + ``Describer`` fan-out +
``describe_dataset`` threading (backend/descriptors.py:24-139) reshaped for
TPU: a descriptor consumes a *batch* of images and returns fixed-shape
arrays, datasets stream through in batches (decode threads on host, one
jitted program on device), and the corner-description cache is a plain
``.npz`` (reference cached via joblib, descriptors.py:112-114).

Set-type descriptors (corner/DAISY/color) return (B, K, D) + validity mask
(the reference's variable-length per-image lists, made static). Global
descriptors (CNN/HOG/dHash) return (B, D).
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Optional, Protocol, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from image_search_engine_tpu.config import Config, CornerDescriptorKind
from image_search_engine_tpu.ops import corners as corner_ops
from image_search_engine_tpu.ops.daisy import daisy
from image_search_engine_tpu.ops.dhash import dhash_bits
from image_search_engine_tpu.ops.hog import hog
from image_search_engine_tpu.ops.image_ops import (
    five_region_masks,
    hsv_histogram_3d,
    rgb_to_gray,
    rgb_to_hsv,
    to_unit_f32,
)
from image_search_engine_tpu.utils.imageio import load_images_batched

log = logging.getLogger(__name__)


class SupportsDescribeBatch(Protocol):
    """Batched descriptor protocol (reference SupportsDescribe,
    descriptors.py:24-25, one image -> here one batch)."""

    is_set: bool  # True: (B, K, D) + valid; False: (B, D)

    def describe_batch(self, images: np.ndarray) -> Tuple[np.ndarray, Optional[np.ndarray]]:
        ...


class CornerDescriptor:
    """ORB/SIFT/BRISK-style keypoint descriptors (reference
    CornerDescriptorFactory + CornerDescriptor, descriptors.py:31-44,
    207-236), fixed-K masked."""

    is_set = True

    def __init__(self, kind: str | CornerDescriptorKind = "orb", max_keypoints: int = 256,
                 n_levels: int = 4, scale_step: float = 1.25):
        self.kind = kind.value if isinstance(kind, CornerDescriptorKind) else kind
        self.max_keypoints = max_keypoints
        self.n_levels = n_levels
        self.scale_step = scale_step

    def describe_device(self, images):
        """Traceable device chain (jnp in, jnp out) — lets callers fuse
        description into a larger jitted program (the engine's one-dispatch
        BoVW query path)."""
        gray = rgb_to_gray(to_unit_f32(images))
        return corner_ops.detect_and_describe(
            gray, self.kind, self.max_keypoints,
            n_levels=self.n_levels, scale_step=self.scale_step,
        )

    def describe_batch(self, images):
        d, valid = self.describe_device(jnp.asarray(images))
        return np.asarray(d), np.asarray(valid)


class DaisyDescriptor:
    """Dense-grid DAISY (reference descriptors.py:238-254)."""

    is_set = True

    def __init__(self, step: int = 32, radius: int = 32, rings: int = 2,
                 histograms: int = 8, orientations: int = 8):
        self.kw = dict(step=step, radius=radius, rings=rings,
                       histograms=histograms, orientations=orientations)

    def describe_device(self, images):
        """Traceable device chain (jnp in, jnp out); see CornerDescriptor."""
        gray = rgb_to_gray(to_unit_f32(images))
        d = daisy(gray, **self.kw)
        return d, jnp.ones(d.shape[:2], bool)

    def describe_batch(self, images):
        d, valid = self.describe_device(jnp.asarray(images))
        return np.asarray(d), np.asarray(valid)


class HOGDescriptor:
    """Whole-image HOG vector (reference descriptors.py:261-275)."""

    is_set = False

    def __init__(self, orientations: int = 9, cell_size: int = 32, block_size: int = 2):
        self.kw = dict(orientations=orientations, cell_size=cell_size, block_size=block_size)

    def describe_batch(self, images):
        gray = rgb_to_gray(to_unit_f32(jnp.asarray(images)))
        return np.asarray(hog(gray, **self.kw)), None


class ColorDescriptor:
    """5-region HSV histograms (reference descriptors.py:278-344):
    4 corner regions minus center ellipse + the ellipse, 8x12x3 bins each."""

    is_set = True

    def __init__(self, bins=(8, 12, 3)):
        self.bins = tuple(bins)

    def describe_batch(self, images):
        images = to_unit_f32(jnp.asarray(images))
        hsv = rgb_to_hsv(images)
        h, w = images.shape[1:3]
        masks = five_region_masks(h, w)  # (5, H, W)
        out = []
        for b in range(images.shape[0]):
            regions = [hsv_histogram_3d(hsv[b], masks[m], self.bins) for m in range(5)]
            out.append(jnp.stack(regions))
        d = np.asarray(jnp.stack(out))  # (B, 5, prod(bins))
        valid = np.ones(d.shape[:2], bool)
        return d, valid


class DHashDescriptor:
    """64-bit difference hash as a 64-D bit vector (reference
    descriptors.py:347-352; packing to ints lives in ops/dhash.py)."""

    is_set = False

    def describe_batch(self, images):
        gray = rgb_to_gray(to_unit_f32(jnp.asarray(images)))
        return np.asarray(dhash_bits(gray)).astype(np.float32), None


class CNNDescriptorAdapter:
    """CNN embeddings via models/embedder.py (reference CNNDescriptor,
    descriptors.py:142-204 — there batch-1, here truly batched)."""

    is_set = False

    def __init__(self, embedder):
        self.embedder = embedder

    def describe_batch(self, images):
        return self.embedder.embed_batch(images), None


def make_descriptor(cfg: Config, embedder=None) -> SupportsDescribeBatch:
    """Descriptor factory driven by config (reference
    CornerDescriptorFactory.get_descriptor + Method dispatch)."""
    from image_search_engine_tpu.config import Method

    if cfg.method == Method.DNN:
        assert embedder is not None
        return CNNDescriptorAdapter(embedder)
    if cfg.method == Method.DHASH:
        return DHashDescriptor()
    kind = cfg.corner_descriptor
    if kind == CornerDescriptorKind.DAISY:
        return DaisyDescriptor(step=cfg.daisy_step, radius=cfg.daisy_radius)
    return CornerDescriptor(kind, cfg.max_descriptors_per_image,
                            n_levels=cfg.corner_n_levels,
                            scale_step=cfg.corner_scale_step)


def describe_dataset(
    descriptor: SupportsDescribeBatch,
    paths: Sequence[str | Path],
    image_size: int = 224,
    batch_size: int = 32,
    cache_path: Optional[str | Path] = None,
    use_native: bool = False,
) -> Tuple[np.ndarray, Optional[np.ndarray], np.ndarray]:
    """Describe a whole corpus (reference describe_dataset,
    descriptors.py:104-139 — joblib threads replaced by a host decode pool
    feeding one jitted device program).

    Returns:
      (features, valid_or_None, kept) where ``kept`` are the indices of
      paths that decoded successfully (error-skip parity).
    """
    import hashlib

    def _sig(v):
        # stable textual signature of a descriptor parameter (objects like
        # an embedder reduce to their type name — id()-bearing reprs would
        # bust the cache every process)
        if isinstance(v, (str, int, float, bool, type(None))):
            return repr(v)
        if isinstance(v, (tuple, list)):
            return "[" + ",".join(_sig(x) for x in v) + "]"
        if isinstance(v, dict):
            return "{" + ",".join(f"{k}:{_sig(x)}" for k, x in sorted(v.items())) + "}"
        return type(v).__name__

    # the key covers the corpus AND the descriptor configuration: the same
    # kind at different params (pyramid depth, keypoint budget, DAISY
    # grid) produces different features, and a params-blind cache would
    # silently serve stale geometry (the reference's joblib cache,
    # descriptors.py:112-114, had exactly this hole)
    desc_sig = type(descriptor).__name__ + _sig(getattr(descriptor, "__dict__", {}))
    corpus_key = hashlib.sha256(
        ("\n".join(str(p) for p in paths) + f"|{image_size}|{desc_sig}").encode()
    ).hexdigest()
    if cache_path is not None and Path(cache_path).exists():
        z = np.load(cache_path, allow_pickle=False)
        cached_key = str(z["corpus_key"]) if "corpus_key" in z.files else ""
        if cached_key == corpus_key:
            log.info("loaded cached descriptions from %s", cache_path)
            valid = z["valid"] if "valid" in z.files else None
            return z["features"], valid, z["kept"]
        log.info("description cache %s is stale (corpus or descriptor "
                 "params changed); rebuilding", cache_path)

    feats, valids, kept = [], [], []
    for batch, idx in load_images_batched(
        paths, batch_size, (image_size, image_size), use_native=use_native
    ):
        f, v = descriptor.describe_batch(batch)
        feats.append(f)
        kept.extend(idx)
        if v is not None:
            valids.append(v)
    features = np.concatenate(feats) if feats else np.zeros((0,))
    valid = np.concatenate(valids) if valids else None
    kept = np.asarray(kept, np.int64)

    if cache_path is not None:
        Path(cache_path).parent.mkdir(parents=True, exist_ok=True)
        payload = {"features": features, "kept": kept,
                   "corpus_key": np.array(corpus_key)}
        if valid is not None:
            payload["valid"] = valid
        np.savez_compressed(cache_path, **payload)
    return features, valid, kept
