"""Shared image filters: separable Gaussian blur, image gradients.

Building blocks for the dense descriptor pipelines (HOG/DAISY/corner
descriptors) — all expressed as convolutions so XLA can tile them onto the
TPU's convolution/matmul units.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp


def gaussian_kernel_1d(sigma: float, radius: int | None = None) -> jnp.ndarray:
    if radius is None:
        radius = max(1, int(math.ceil(3.0 * sigma)))
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (x / sigma) ** 2)
    return k / jnp.sum(k)


@functools.partial(jax.jit, static_argnames=("sigma", "radius"))
def gaussian_blur(img: jnp.ndarray, sigma: float, radius: int | None = None) -> jnp.ndarray:
    """Separable Gaussian blur over (..., H, W) with reflect padding."""
    k = gaussian_kernel_1d(sigma, radius)
    r = (k.shape[0] - 1) // 2
    lead = img.shape[:-2]
    x = img.reshape((-1,) + img.shape[-2:])  # (B, H, W)

    xp = jnp.pad(x, ((0, 0), (r, r), (0, 0)), mode="reflect")
    x = jax.lax.conv_general_dilated(
        xp[:, None], k.reshape(1, 1, -1, 1), (1, 1), "VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )[:, 0]
    xp = jnp.pad(x, ((0, 0), (0, 0), (r, r)), mode="reflect")
    x = jax.lax.conv_general_dilated(
        xp[:, None], k.reshape(1, 1, 1, -1), (1, 1), "VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )[:, 0]
    return x.reshape(lead + x.shape[-2:])


@jax.jit
def gradients(img: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Centered-difference gradients (np.gradient semantics: one-sided at
    the borders) over (..., H, W). Returns (gy, gx)."""
    gy_inner = (img[..., 2:, :] - img[..., :-2, :]) * 0.5
    gy = jnp.concatenate(
        [
            (img[..., 1:2, :] - img[..., 0:1, :]),
            gy_inner,
            (img[..., -1:, :] - img[..., -2:-1, :]),
        ],
        axis=-2,
    )
    gx_inner = (img[..., :, 2:] - img[..., :, :-2]) * 0.5
    gx = jnp.concatenate(
        [
            (img[..., :, 1:2] - img[..., :, 0:1]),
            gx_inner,
            (img[..., :, -1:] - img[..., :, -2:-1]),
        ],
        axis=-1,
    )
    return gy, gx


@jax.jit
def sobel(img: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Sobel gradients over (..., H, W) with reflect padding: (gy, gx)."""
    lead = img.shape[:-2]
    x = img.reshape((-1, 1) + img.shape[-2:])
    kx = jnp.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], jnp.float32).reshape(1, 1, 3, 3)
    ky = jnp.array([[-1, -2, -1], [0, 0, 0], [1, 2, 1]], jnp.float32).reshape(1, 1, 3, 3)
    xp = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (1, 1)), mode="reflect")
    gx = jax.lax.conv_general_dilated(xp, kx, (1, 1), "VALID",
                                      dimension_numbers=("NCHW", "OIHW", "NCHW"))[:, 0]
    gy = jax.lax.conv_general_dilated(xp, ky, (1, 1), "VALID",
                                      dimension_numbers=("NCHW", "OIHW", "NCHW"))[:, 0]
    return gy.reshape(lead + gy.shape[-2:]), gx.reshape(lead + gx.shape[-2:])
