"""DAISY dense descriptors in JAX (Tola et al., TPAMI 2010).

Replaces the reference's skimage DAISY wrapper (backend/descriptors.py:
238-254: step=32, radius=32, rings=2, histograms=8, orientations=8 ->
136-D descriptors on a dense grid). DAISY is the TPU-friendliest local
descriptor — orientation maps are elementwise trig, the ring pooling is a
stack of separable Gaussian blurs, and grid sampling is static-index
slicing — so the whole batch compiles to one fused XLA program with no
per-keypoint host loop.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

from image_search_engine_tpu.ops.filters import gaussian_blur


@functools.partial(
    jax.jit,
    static_argnames=("step", "radius", "rings", "histograms", "orientations", "normalization"),
)
def daisy(
    img: jnp.ndarray,
    step: int = 32,
    radius: int = 32,
    rings: int = 2,
    histograms: int = 8,
    orientations: int = 8,
    normalization: str = "l1",
) -> jnp.ndarray:
    """DAISY descriptors on a dense grid.

    Args:
      img: (H, W) or (B, H, W) grayscale float images.
      step: grid stride in pixels.
      radius: outermost ring radius.
      rings: number of concentric rings.
      histograms: sample points per ring.
      orientations: gradient orientation bins.
      normalization: "l1" | "l2" | "daisy" (per-histogram l2) | "off".
    Returns:
      (B, P, D) (or (P, D) unbatched) where P = grid points and
      D = (rings*histograms + 1) * orientations.
    """
    batched = img.ndim == 3
    if not batched:
        img = img[None]
    b, h, w = img.shape

    # Oriented gradient maps: G_o = max(0, cos(grad_ori - theta_o)) * |grad|
    dy = jnp.concatenate([img[:, 1:, :] - img[:, :-1, :], jnp.zeros((b, 1, w))], axis=1)
    dx = jnp.concatenate([img[:, :, 1:] - img[:, :, :-1], jnp.zeros((b, h, 1))], axis=2)
    mag = jnp.sqrt(dx * dx + dy * dy)
    ori = jnp.arctan2(dy, dx)
    thetas = jnp.arange(orientations, dtype=jnp.float32) * (2.0 * math.pi / orientations)
    maps = jnp.maximum(jnp.cos(ori[:, None] - thetas[None, :, None, None]), 0.0) * mag[:, None]
    # maps: (B, O, H, W)

    # Cumulative Gaussian pooling: center sigma, then one sigma per ring.
    sigmas = [radius / (2.0 * rings) * (i + 1) for i in range(rings + 1)]
    pooled = []
    cur = maps
    prev_sigma = 0.0
    for s in sigmas:
        inc = math.sqrt(max(s**2 - prev_sigma**2, 1e-6))
        cur = gaussian_blur(cur, inc)
        pooled.append(cur)
        prev_sigma = s
    # pooled[r]: (B, O, H, W), r=0 is the center scale

    # Dense grid of descriptor centers.
    ys = list(range(radius, h - radius, step)) or [h // 2]
    xs = list(range(radius, w - radius, step)) or [w // 2]

    grid_y = jnp.asarray(ys, jnp.int32)
    grid_x = jnp.asarray(xs, jnp.int32)

    def sample(m, oy: int, ox: int):
        # m: (B, O, H, W) -> (B, O, len(ys), len(xs)) at grid+offset
        return m[:, :, grid_y + oy][:, :, :, grid_x + ox]

    parts = [sample(pooled[0], 0, 0)]  # center histogram
    for r in range(rings):
        rad = (r + 1) * radius / rings
        for j in range(histograms):
            ang = 2.0 * math.pi * j / histograms
            oy = int(round(rad * math.sin(ang)))
            ox = int(round(rad * math.cos(ang)))
            parts.append(sample(pooled[r + 1], oy, ox))
    # each part: (B, O, P_y, P_x)
    desc = jnp.stack(parts, axis=1)  # (B, n_hist, O, P_y, P_x)
    desc = desc.transpose(0, 3, 4, 1, 2)  # (B, P_y, P_x, n_hist, O)
    n_hist = 1 + rings * histograms
    desc = desc.reshape(b, len(ys) * len(xs), n_hist, orientations)

    if normalization == "l1":
        desc = desc.reshape(b, -1, n_hist * orientations)
        desc = desc / (jnp.sum(jnp.abs(desc), axis=-1, keepdims=True) + 1e-10)
    elif normalization == "l2":
        desc = desc.reshape(b, -1, n_hist * orientations)
        desc = desc / (jnp.linalg.norm(desc, axis=-1, keepdims=True) + 1e-10)
    elif normalization == "daisy":
        desc = desc / (jnp.linalg.norm(desc, axis=-1, keepdims=True) + 1e-10)
        desc = desc.reshape(b, -1, n_hist * orientations)
    elif normalization == "off":
        desc = desc.reshape(b, -1, n_hist * orientations)
    else:
        raise ValueError(f"unknown normalization {normalization!r}")

    return desc if batched else desc[0]
