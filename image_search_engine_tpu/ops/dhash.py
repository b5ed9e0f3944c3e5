"""Difference-hash (dHash) perceptual hashing.

Replaces the reference's DHashDescriptor + hash utils (backend/
descriptors.py:347-352, backend/utils.py:65-88): 8x8 horizontal-gradient
hash -> 64-bit integer, hamming distance between hashes. Batched: a whole
corpus is hashed in one jitted program, and query-time matching is a
vectorized hamming scan over the stored bit matrix (the reference's
dict-of-exact-hashes lookup generalizes to nearest-hamming search, which
also fixes the reference engine's broken DHASH query path, engine.py:83).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from image_search_engine_tpu.ops.image_ops import resize, rgb_to_gray

HASH_SIZE = 8  # 8x8 differences = 64 bits


@jax.jit
def dhash_bits(gray: jnp.ndarray) -> jnp.ndarray:
    """Bit matrix for a batch of grayscale images.

    Args:
      gray: (B, H, W) float images.
    Returns:
      (B, 64) bool — column-gradient bits row-major, matching the classic
      dHash: resize to (8, 9), bit = px[x+1] > px[x].
    """
    small = resize(gray[..., None], HASH_SIZE, HASH_SIZE + 1)[..., 0]  # (B, 8, 9)
    bits = small[:, :, 1:] > small[:, :, :-1]  # (B, 8, 8)
    return bits.reshape(bits.shape[0], HASH_SIZE * HASH_SIZE)


def bits_to_int(bits: np.ndarray) -> np.ndarray:
    """(B, 64) bool -> (B,) uint64 python-int-compatible hashes (the
    reference's convert_hash keeps hashes as plain ints, utils.py:75-80)."""
    bits = np.asarray(bits, np.uint64)
    weights = (np.uint64(1) << np.arange(64, dtype=np.uint64))[::-1]
    return (bits * weights).sum(axis=1, dtype=np.uint64)


def int_to_bits(h: np.ndarray) -> np.ndarray:
    h = np.asarray(h, np.uint64).reshape(-1)
    shifts = np.arange(64, dtype=np.uint64)[::-1]
    return ((h[:, None] >> shifts) & np.uint64(1)).astype(bool)


def dhash_images(images: jnp.ndarray) -> np.ndarray:
    """(B, H, W, 3) RGB [0,1] -> (B,) uint64 hashes."""
    return bits_to_int(np.asarray(dhash_bits(rgb_to_gray(images))))


@jax.jit
def hamming_scan(query_bits: jnp.ndarray, db_bits: jnp.ndarray) -> jnp.ndarray:
    """Hamming distances of one-or-more query bit rows against the corpus.

    Args:
      query_bits: (Q, 64) bool.
      db_bits: (N, 64) bool.
    Returns:
      (Q, N) int32 distances (generalizes the reference's hamming(),
      utils.py:83-88, to a batched scan).
    """
    q = query_bits.astype(jnp.int32)
    d = db_bits.astype(jnp.int32)
    # XOR popcount via arithmetic: q + d - 2qd, summed over bits (rides MXU)
    cross = jnp.dot(q, d.T, preferred_element_type=jnp.float32)
    return (q.sum(1, keepdims=True) + d.sum(1)[None, :] - 2.0 * cross).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("k",))
def hamming_topk(query_bits: jnp.ndarray, db_bits: jnp.ndarray, k: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """k nearest hashes by hamming distance: (distances, indices)."""
    dist = hamming_scan(query_bits, db_bits)
    vals, idx = jax.lax.top_k(-dist, k)
    return -vals, idx
