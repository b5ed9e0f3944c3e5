"""Color-moment hash: 42-D moment invariants per image.

Replaces the reference's ``cv2.img_hash.colorMomentHash`` wrapper
(ColorMomentHashDescriptor, backend/descriptors.py:355-357 — present but
unwired into Method). The classic construction (Tang et al.): for each of
the 3 channels in two colorspaces (YCbCr and HSV), compute the first 7 Hu
moment invariants of the channel image -> 3*2*7 = 42 features. Batched and
jitted; nearest-neighbor matching via plain L2 over the 42-D vectors.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from image_search_engine_tpu.ops.image_ops import rgb_to_hsv


def _rgb_to_ycbcr(img: jnp.ndarray) -> jnp.ndarray:
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 0.5 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 0.5 + 0.5 * r - 0.418688 * g - 0.081312 * b
    return jnp.stack([y, cb, cr], axis=-1)


def _hu_moments(ch: jnp.ndarray) -> jnp.ndarray:
    """First 7 Hu invariants of one (B, H, W) channel batch -> (B, 7)."""
    b, h, w = ch.shape
    ys = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    xs = jnp.arange(w, dtype=jnp.float32)[None, None, :]

    m00 = jnp.sum(ch, axis=(1, 2)) + 1e-12
    m10 = jnp.sum(ch * ys, axis=(1, 2))
    m01 = jnp.sum(ch * xs, axis=(1, 2))
    cy = (m10 / m00)[:, None, None]
    cx = (m01 / m00)[:, None, None]
    dy = ys - cy
    dx = xs - cx

    def mu(p, q):
        return jnp.sum(ch * dy**p * dx**q, axis=(1, 2))

    def eta(p, q):
        return mu(p, q) / m00 ** (1 + (p + q) / 2.0)

    n20, n02, n11 = eta(2, 0), eta(0, 2), eta(1, 1)
    n30, n03, n21, n12 = eta(3, 0), eta(0, 3), eta(2, 1), eta(1, 2)

    h1 = n20 + n02
    h2 = (n20 - n02) ** 2 + 4 * n11**2
    h3 = (n30 - 3 * n12) ** 2 + (3 * n21 - n03) ** 2
    h4 = (n30 + n12) ** 2 + (n21 + n03) ** 2
    h5 = (n30 - 3 * n12) * (n30 + n12) * ((n30 + n12) ** 2 - 3 * (n21 + n03) ** 2) + (
        3 * n21 - n03
    ) * (n21 + n03) * (3 * (n30 + n12) ** 2 - (n21 + n03) ** 2)
    h6 = (n20 - n02) * ((n30 + n12) ** 2 - (n21 + n03) ** 2) + 4 * n11 * (n30 + n12) * (
        n21 + n03
    )
    h7 = (3 * n21 - n03) * (n30 + n12) * ((n30 + n12) ** 2 - 3 * (n21 + n03) ** 2) - (
        n30 - 3 * n12
    ) * (n21 + n03) * (3 * (n30 + n12) ** 2 - (n21 + n03) ** 2)
    return jnp.stack([h1, h2, h3, h4, h5, h6, h7], axis=1)


@jax.jit
def color_moment_hash(images: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, 3) RGB [0,1] -> (B, 42) moment-hash features."""
    ycbcr = _rgb_to_ycbcr(images)
    hsv = rgb_to_hsv(images)
    hsv = hsv.at[..., 0].divide(360.0)  # comparable channel scales
    feats = []
    for space in (ycbcr, hsv):
        for c in range(3):
            feats.append(_hu_moments(space[..., c]))
    return jnp.concatenate(feats, axis=1)
