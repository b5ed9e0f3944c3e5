"""Codeword histograms for BoVW.

Replaces the reference's per-image ``np.histogram`` over quantized
descriptor codes (backend/bag_of_visual_words.py:98-106, threaded over
chunks at :108-113) with a single batched ``segment_sum`` on device: all
images' descriptors are quantized in one matmul+argmin sweep and scattered
into per-image histogram rows in one op — no host threading.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("num_images", "num_clusters"))
def codes_to_histograms(
    codes: jnp.ndarray,
    image_ids: jnp.ndarray,
    num_images: int,
    num_clusters: int,
    valid: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Scatter descriptor codes into per-image codeword histograms.

    Args:
      codes: (T,) int32 nearest-centroid code per descriptor (flattened over
        all images).
      image_ids: (T,) int32 owning-image row for each descriptor.
      num_images: number of histogram rows (static python int).
      num_clusters: codebook size K.
      valid: optional (T,) bool mask; padded descriptor slots contribute 0.

    Returns:
      (num_images, K) f32 counts.
    """
    n = int(num_images)
    flat = image_ids.astype(jnp.int32) * num_clusters + codes.astype(jnp.int32)
    weights = jnp.ones_like(flat, jnp.float32)
    if valid is not None:
        weights = jnp.where(valid, weights, 0.0)
        flat = jnp.where(valid, flat, 0)
    hist = jax.ops.segment_sum(weights, flat, num_segments=n * num_clusters)
    return hist.reshape(n, num_clusters)


@functools.partial(jax.jit, static_argnames=("num_clusters",))
def batched_histograms(codes: jnp.ndarray, valid: jnp.ndarray, num_clusters: int) -> jnp.ndarray:
    """Histogram per image from fixed-size (B, M) code matrices.

    TPU-shaped variant: every image carries exactly M descriptor slots
    (padded, masked by ``valid``), so the scatter is a dense one-hot matmul
    that rides the MXU.

    Args:
      codes: (B, M) int32 codes.
      valid: (B, M) bool.
      num_clusters: K.
    Returns:
      (B, K) f32 counts.
    """
    one_hot = jax.nn.one_hot(codes, num_clusters, dtype=jnp.float32)  # (B, M, K)
    one_hot = one_hot * valid[..., None].astype(jnp.float32)
    return jnp.sum(one_hot, axis=1)
