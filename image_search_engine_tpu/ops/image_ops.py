"""Batched image preprocessing on device.

Replaces the reference's OpenCV/albumentations/PIL hot paths — per-image
``cv2.resize``/``Normalize`` (backend/descriptors.py:153-159), BGR->GRAY
(descriptors.py:225-227) and BGR->HSV (descriptors.py:299) conversions —
with jitted, vmapped array ops: whole batches are resized/normalized in one
XLA program instead of one image at a time on the CPU.

Convention: images are float32 RGB in [0, 1], shape (H, W, 3) or batched
(B, H, W, 3). (The reference uses OpenCV's BGR uint8; host-side decode in
utils/imageio.py hands us RGB floats.) The batched corpus-loading path may
instead hand uint8 [0, 255] straight through — ``to_unit_f32`` is the
single entry cast, and running it on device means host->device transfers
move 4x fewer bytes than uploading pre-divided float32.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

# ImageNet statistics (RGB) used by the reference's albumentations
# Normalize defaults (descriptors.py:156-158).
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def to_unit_f32(img: jnp.ndarray) -> jnp.ndarray:
    """uint8 [0,255] or float [0,1] -> float32 [0,1].

    Every image entry point accepts either dtype; keeping the corpus
    uint8 until this (device-side) cast quarters the upload volume. The
    uint8/255 result is bit-identical to the PIL host path's
    ``np.float32(im)/255`` — no quality drift between the two routes.
    """
    if img.dtype == jnp.uint8:
        return img.astype(jnp.float32) / jnp.float32(255.0)
    return img.astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("height", "width", "method"))
def resize(img: jnp.ndarray, height: int, width: int, method: str = "bilinear") -> jnp.ndarray:
    """Resize (B, H, W, C) or (H, W, C) images."""
    batched = img.ndim == 4
    if not batched:
        img = img[None]
    out = jax.image.resize(
        img, (img.shape[0], height, width, img.shape[3]), method=method
    )
    return out if batched else out[0]


@jax.jit
def normalize_imagenet(img: jnp.ndarray) -> jnp.ndarray:
    """(x - mean) / std per channel, RGB in [0,1]."""
    mean = jnp.asarray(IMAGENET_MEAN, img.dtype)
    std = jnp.asarray(IMAGENET_STD, img.dtype)
    return (img - mean) / std


@functools.partial(jax.jit, static_argnames=("size", "norm"))
def preprocess_for_cnn(img: jnp.ndarray, size: int = 224,
                       norm: str = "imagenet") -> jnp.ndarray:
    """resize(size) + normalize as one fused program.

    ``norm="imagenet"`` matches the reference's albumentations pipeline
    for torchvision backbones (descriptors.py:153-159); ``norm="unit"``
    is (x - 0.5) / 0.5, HF BitImageProcessor's default for
    ``google/bit-50`` (reference descriptors.py:170-172)."""
    x = resize(img, size, size)
    if norm == "unit":
        return (x - 0.5) / 0.5
    return normalize_imagenet(x)


@jax.jit
def rgb_to_gray(img: jnp.ndarray) -> jnp.ndarray:
    """ITU-R BT.601 luma (matches cv2.cvtColor COLOR_*2GRAY weights).
    (..., H, W, 3) -> (..., H, W)."""
    w = jnp.asarray([0.299, 0.587, 0.114], img.dtype)
    return jnp.tensordot(img, w, axes=[[-1], [0]])


@jax.jit
def rgb_to_hsv(img: jnp.ndarray) -> jnp.ndarray:
    """RGB [0,1] -> HSV with H in [0, 360), S,V in [0,1].

    Matches cv2's float-image HSV convention (cv2.cvtColor on f32 returns
    H in degrees), which backs the reference's ColorDescriptor histograms
    (descriptors.py:299).
    """
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    v = jnp.maximum(jnp.maximum(r, g), b)
    mn = jnp.minimum(jnp.minimum(r, g), b)
    c = v - mn
    safe_c = jnp.where(c > 0, c, 1.0)
    h = jnp.where(
        v == r,
        (g - b) / safe_c,
        jnp.where(v == g, 2.0 + (b - r) / safe_c, 4.0 + (r - g) / safe_c),
    )
    h = jnp.where(c > 0, h * 60.0, 0.0)
    h = jnp.where(h < 0, h + 360.0, h)
    s = jnp.where(v > 0, c / jnp.where(v > 0, v, 1.0), 0.0)
    return jnp.stack([h, s, v], axis=-1)


@functools.partial(jax.jit, static_argnames=("bins", "ranges"))
def hsv_histogram_3d(
    hsv: jnp.ndarray,
    mask: jnp.ndarray,
    bins: Tuple[int, int, int] = (8, 12, 3),
    ranges: Tuple[Tuple[float, float], ...] = ((0.0, 360.0), (0.0, 1.0), (0.0, 1.0)),
) -> jnp.ndarray:
    """Masked 3-D HSV histogram, flattened and L2^1-normalized to sum 1 —
    the cv2.calcHist+normalize step of the reference's ColorDescriptor
    (descriptors.py:316-334). hsv: (H, W, 3); mask: (H, W) bool/float."""
    idx = []
    for c, (nb, (lo, hi)) in enumerate(zip(bins, ranges)):
        t = (hsv[..., c] - lo) / (hi - lo) * nb
        idx.append(jnp.clip(t.astype(jnp.int32), 0, nb - 1))
    flat = (idx[0] * bins[1] + idx[1]) * bins[2] + idx[2]
    w = mask.astype(jnp.float32).reshape(-1)
    hist = jax.ops.segment_sum(w, flat.reshape(-1), num_segments=bins[0] * bins[1] * bins[2])
    return hist / jnp.maximum(jnp.sum(hist), 1e-12)


def five_region_masks(h: int, w: int) -> jnp.ndarray:
    """The reference ColorDescriptor's segmentation (descriptors.py:296-315):
    four corner rectangles minus the center ellipse, plus the ellipse.
    Returns (5, H, W) float masks (order: TL, TR, BR, BL, center)."""
    cy, cx = h / 2.0, w / 2.0
    ys = jnp.arange(h, dtype=jnp.float32)[:, None]
    xs = jnp.arange(w, dtype=jnp.float32)[None, :]
    # centered ellipse with 75%-of-half axes (reference uses int(0.75*w)/2)
    ax, ay = 0.75 * w / 2.0, 0.75 * h / 2.0
    ellipse = (((xs - cx) / ax) ** 2 + ((ys - cy) / ay) ** 2) <= 1.0
    tl = (ys < cy) & (xs < cx)
    tr = (ys < cy) & (xs >= cx)
    br = (ys >= cy) & (xs >= cx)
    bl = (ys >= cy) & (xs < cx)
    corners = jnp.stack([tl, tr, br, bl]) & ~ellipse[None]
    return jnp.concatenate([corners, ellipse[None]], axis=0).astype(jnp.float32)
