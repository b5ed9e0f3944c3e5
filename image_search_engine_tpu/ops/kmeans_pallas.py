"""Pallas k-means assignment kernel: distance matmul + fused argmin.

The hot loop of codebook training (reference: faiss.Kmeans Lloyd iterations,
backend/kmeans_faiss.py:29-41, and the k=1 quantization searches at
kmeans_faiss.py:49). Centroids are pinned in VMEM; points stream through in
tiles; the argmin is fused into the matmul epilogue so per-point distances
never hit HBM.

Plugs into ops/kmeans.lloyd via the ``assign_fn`` hook — identical contract
to ``assign_jax`` and parity-tested against it.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from image_search_engine_tpu.ops import round_up



def _assign_kernel(x_ref, c_ref, cn_ref, codes_ref, dist_ref, *, k_valid: int):
    """One point tile: codes = argmin_j ||x - c_j||^2, dist = partial min.

    x_ref: (TILE_N, dp); c_ref: (Kp, dp); cn_ref: (1, Kp) centroid norms.
    codes_ref/dist_ref: (TILE_N, 1) outputs (sq-dist missing the ||x||^2
    per-row constant, re-added by the wrapper).
    """
    cross = jax.lax.dot_general(
        x_ref[:],
        c_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (TILE_N, Kp)
    partial = cn_ref[0, :][None, :] - 2.0 * cross
    tile_n, kp = partial.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (tile_n, kp), 1)
    partial = jnp.where(col < k_valid, partial, jnp.float32(jnp.inf))
    codes_ref[:, 0] = jnp.argmin(partial, axis=1).astype(jnp.int32)
    dist_ref[:, 0] = jnp.min(partial, axis=1)


@functools.partial(jax.jit, static_argnames=("tile_n", "interpret"))
def assign_pallas(
    x: jnp.ndarray,
    centroids: jnp.ndarray,
    *,
    tile_n: int = 2048,
    interpret: Optional[bool] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Nearest-centroid assignment. Contract matches ops.kmeans.assign_jax:
    returns (codes (N,) int32, true squared distances (N,) f32)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    n, d = x.shape
    k = centroids.shape[0]
    dp = round_up(d, 128)
    kp = round_up(k, 128)
    tile_n = min(tile_n, round_up(n, 8))
    npad = round_up(n, tile_n)

    xf = jnp.pad(x.astype(jnp.float32), ((0, npad - n), (0, dp - d)))
    cf = jnp.pad(centroids.astype(jnp.float32), ((0, kp - k), (0, dp - d)))
    cn = jnp.sum(cf * cf, axis=1).reshape(1, kp)

    grid = (npad // tile_n,)
    codes, dist = pl.pallas_call(
        functools.partial(_assign_kernel, k_valid=k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_n, dp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((kp, dp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kp), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tile_n, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((npad, 1), jnp.int32),
            jax.ShapeDtypeStruct((npad, 1), jnp.float32),
        ),
        interpret=interpret,
    )(xf, cf, cn)

    xn = jnp.sum(x.astype(jnp.float32) * x, axis=1)
    return codes[:n, 0], jnp.maximum(dist[:n, 0] + xn, 0.0)
