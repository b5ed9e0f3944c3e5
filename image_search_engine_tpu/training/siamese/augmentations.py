"""Batched image augmentations on device.

The reference pipes every training image through albumentations on the
host — HSV jitter, brightness/contrast, gamma, ISO noise, coarse dropout,
blur, zoom-out-only shift/scale/rotate, all padded WHITE for card images
(backend/siamese/augmentations.py:5-40) — via a ``tf.numpy_function``
graph-break that SURVEY.md flags as a bottleneck (siamese_tf/dataset.py:
57-59). Here the same augmentation family is pure jitted JAX: one fused
program augments the whole batch on the TPU, keyed by a PRNG key, so the
input pipeline never leaves the device.
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp

from image_search_engine_tpu.ops.filters import gaussian_blur
from image_search_engine_tpu.ops.image_ops import rgb_to_hsv


def _hsv_to_rgb(hsv: jnp.ndarray) -> jnp.ndarray:
    """Inverse of ops.image_ops.rgb_to_hsv (H in degrees)."""
    h, s, v = hsv[..., 0] / 60.0, hsv[..., 1], hsv[..., 2]
    c = v * s
    x = c * (1.0 - jnp.abs(jnp.mod(h, 2.0) - 1.0))
    m = v - c
    z = jnp.zeros_like(c)
    i = jnp.clip(jnp.floor(h).astype(jnp.int32), 0, 5)
    sel = [i == k for k in range(6)]
    r = jnp.select(sel, [c, x, z, z, x, c])
    g = jnp.select(sel, [x, c, c, x, z, z])
    b = jnp.select(sel, [z, z, x, c, c, x])
    return jnp.stack([r + m, g + m, b + m], axis=-1)


def _affine_sample(img: jnp.ndarray, mat: jnp.ndarray, fill: float = 1.0) -> jnp.ndarray:
    """Bilinear-sample one (H, W, C) image at affine-transformed coords.
    mat: (2, 3) mapping output (y, x, 1) -> input coords. Out-of-bounds
    fills WHITE (the reference's card-image padding)."""
    h, w, c = img.shape
    ys = jnp.arange(h, dtype=jnp.float32)
    xs = jnp.arange(w, dtype=jnp.float32)
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    src_y = mat[0, 0] * gy + mat[0, 1] * gx + mat[0, 2]
    src_x = mat[1, 0] * gy + mat[1, 1] * gx + mat[1, 2]

    y0 = jnp.floor(src_y).astype(jnp.int32)
    x0 = jnp.floor(src_x).astype(jnp.int32)
    wy = src_y - y0
    wx = src_x - x0

    def gather(yi, xi):
        yc = jnp.clip(yi, 0, h - 1)
        xc = jnp.clip(xi, 0, w - 1)
        return img[yc, xc]

    v00 = gather(y0, x0)
    v01 = gather(y0, x0 + 1)
    v10 = gather(y0 + 1, x0)
    v11 = gather(y0 + 1, x0 + 1)
    out = (
        v00 * ((1 - wy) * (1 - wx))[..., None]
        + v01 * ((1 - wy) * wx)[..., None]
        + v10 * (wy * (1 - wx))[..., None]
        + v11 * (wy * wx)[..., None]
    )
    inside = (
        (src_y >= 0) & (src_y <= h - 1) & (src_x >= 0) & (src_x <= w - 1)
    )[..., None]
    return jnp.where(inside, out, fill)


@functools.partial(jax.jit, static_argnames=())
def augment_batch(key: jax.Array, images: jnp.ndarray) -> jnp.ndarray:
    """Full augmentation stack over (B, H, W, 3) RGB [0,1] images."""
    b, h, w, _ = images.shape
    keys = jax.random.split(key, 10)

    # brightness / contrast (albumentations RandomBrightnessContrast)
    bright = jax.random.uniform(keys[0], (b, 1, 1, 1), minval=-0.2, maxval=0.2)
    contrast = jax.random.uniform(keys[1], (b, 1, 1, 1), minval=0.8, maxval=1.2)
    x = jnp.clip((images - 0.5) * contrast + 0.5 + bright, 0.0, 1.0)

    # gamma (RandomGamma)
    gamma = jax.random.uniform(keys[2], (b, 1, 1, 1), minval=0.8, maxval=1.25)
    x = jnp.clip(x, 1e-6, 1.0) ** gamma

    # HSV jitter (HueSaturationValue)
    hsv = rgb_to_hsv(x)
    dh = jax.random.uniform(keys[3], (b, 1, 1), minval=-15.0, maxval=15.0)
    ds = jax.random.uniform(keys[4], (b, 1, 1), minval=0.85, maxval=1.15)
    hsv = hsv.at[..., 0].set(jnp.mod(hsv[..., 0] + dh, 360.0))
    hsv = hsv.at[..., 1].set(jnp.clip(hsv[..., 1] * ds, 0.0, 1.0))
    x = jnp.clip(_hsv_to_rgb(hsv), 0.0, 1.0)

    # ISO-style gaussian noise
    noise_sigma = jax.random.uniform(keys[5], (b, 1, 1, 1), minval=0.0, maxval=0.03)
    x = jnp.clip(x + noise_sigma * jax.random.normal(keys[6], x.shape), 0.0, 1.0)

    # coarse dropout: one random rectangle per image, filled white
    cy = jax.random.randint(keys[7], (b, 1, 1), 0, h)
    cx = jax.random.randint(keys[8], (b, 1, 1), 0, w)
    sz = h // 8
    gy = jax.lax.broadcasted_iota(jnp.int32, (b, h, w), 1)
    gx = jax.lax.broadcasted_iota(jnp.int32, (b, h, w), 2)
    hole = (jnp.abs(gy - cy) < sz) & (jnp.abs(gx - cx) < sz)
    x = jnp.where(hole[..., None], 1.0, x)

    # zoom-out-only shift/scale/rotate with white padding
    # (reference ShiftScaleRotate scale_limit=(-0.3, 0), border WHITE)
    akeys = jax.random.split(keys[9], b)

    def make_mat(k):
        k1, k2, k3, k4 = jax.random.split(k, 4)
        scale = 1.0 / jax.random.uniform(k1, (), minval=0.7, maxval=1.0)  # >= 1: zoom out
        theta = jax.random.uniform(k2, (), minval=-0.15, maxval=0.15)
        ty = jax.random.uniform(k3, (), minval=-0.06, maxval=0.06) * h
        tx = jax.random.uniform(k4, (), minval=-0.06, maxval=0.06) * w
        cyy, cxx = (h - 1) / 2.0, (w - 1) / 2.0
        cos_t, sin_t = jnp.cos(theta) * scale, jnp.sin(theta) * scale
        # output (y,x) -> input coords, rotation/scale about the center
        m02 = cyy - cos_t * cyy + sin_t * cxx + ty
        m12 = cxx - sin_t * cyy - cos_t * cxx + tx
        return jnp.array([[cos_t, -sin_t, m02], [sin_t, cos_t, m12]])

    mats = jax.vmap(make_mat)(akeys)
    x = jax.vmap(_affine_sample, in_axes=(0, 0))(x, mats)
    return jnp.clip(x, 0.0, 1.0)
