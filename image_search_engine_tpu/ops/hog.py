"""Histogram-of-Oriented-Gradients descriptor in JAX.

Replaces the reference's skimage HOG wrapper (backend/descriptors.py:
261-275: 9 orientations, 32x32 pixel cells, 2x2-cell blocks, L2-Hys block
norm) with a batched, jitted implementation: gradient, cell-histogram
pooling and block normalization are all dense array ops that vmap over the
image batch.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from image_search_engine_tpu.ops.filters import gradients


@functools.partial(
    jax.jit,
    static_argnames=("orientations", "cell_size", "block_size"),
)
def hog(
    img: jnp.ndarray,
    orientations: int = 9,
    cell_size: int = 32,
    block_size: int = 2,
    eps: float = 1e-6,
) -> jnp.ndarray:
    """HOG feature vector(s).

    Args:
      img: (H, W) or (B, H, W) grayscale float images. H and W are cropped
        down to whole cells.
      orientations: unsigned-orientation bins over [0, 180).
      cell_size: pixels per cell side.
      block_size: cells per block side (L2-Hys normalized).
    Returns:
      (F,) or (B, F) feature vectors,
      F = n_blocks_y * n_blocks_x * block_size^2 * orientations.
    """
    batched = img.ndim == 3
    if not batched:
        img = img[None]
    b, h, w = img.shape
    cy = (h // cell_size) * cell_size
    cx = (w // cell_size) * cell_size
    img = img[:, :cy, :cx]
    n_cy, n_cx = cy // cell_size, cx // cell_size

    gy, gx = gradients(img)
    mag = jnp.sqrt(gx * gx + gy * gy)
    # unsigned orientation in [0, 180)
    ang = jnp.rad2deg(jnp.arctan2(gy, gx)) % 180.0

    # hard-assign each pixel to an orientation bin, pool magnitudes per cell
    bin_idx = jnp.clip((ang / (180.0 / orientations)).astype(jnp.int32), 0, orientations - 1)
    one_hot = jax.nn.one_hot(bin_idx, orientations, dtype=jnp.float32)  # (B,H,W,O)
    votes = one_hot * mag[..., None]
    cells = votes.reshape(b, n_cy, cell_size, n_cx, cell_size, orientations).sum(axis=(2, 4))
    # cells: (B, n_cy, n_cx, O)

    # overlapping block_size x block_size blocks of cells
    n_by, n_bx = n_cy - block_size + 1, n_cx - block_size + 1
    blocks = []
    for dy in range(block_size):
        for dx in range(block_size):
            blocks.append(cells[:, dy : dy + n_by, dx : dx + n_bx, :])
    blocks = jnp.concatenate(blocks, axis=-1)  # (B, n_by, n_bx, bs*bs*O)

    # L2-Hys: L2-normalize, clip at 0.2, renormalize
    def l2n(v):
        return v / jnp.sqrt(jnp.sum(v * v, axis=-1, keepdims=True) + eps**2)

    blocks = l2n(jnp.minimum(l2n(blocks), 0.2))
    out = blocks.reshape(b, -1)
    return out if batched else out[0]
