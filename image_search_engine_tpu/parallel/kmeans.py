"""Distributed k-means: Lloyd's iterations over an ICI-sharded point set.

The multi-chip codebook trainer mandated by SURVEY.md §2.3: points are
row-sharded over the mesh's data axis; every device assigns its shard to
the replicated centroids (matmul + argmin on its own chip) and contributes
per-cluster partial sums/counts via ``psum`` — the update step is then
identical on every device, keeping centroids replicated with no explicit
broadcast. Semantics match ops/kmeans.lloyd (spherical renorm, empty
clusters keep their centroid), parity-tested on the 8-device CPU mesh.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from image_search_engine_tpu.ops.distances import l2_normalize
from image_search_engine_tpu.ops.kmeans import _random_init


def lloyd_sharded(
    x_sharded: jnp.ndarray,
    weights_sharded: jnp.ndarray,
    init_centroids: jnp.ndarray,
    k: int,
    mesh: Mesh,
    niter: int = 25,
    spherical: bool = False,
    axis: str = "data",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Distributed Lloyd iterations.

    Args:
      x_sharded: (Npad, d) points row-sharded over ``axis``; padding rows
        must carry weight 0.
      weights_sharded: (Npad,) 1.0 for real rows, 0.0 for padding.
      init_centroids: (k, d) replicated initial centroids.
      k: number of centroids.
      mesh: 1-D device mesh.
    Returns:
      (centroids (k, d), inertia) — replicated.
    """

    def shard_fn(x_local, w_local, c0):
        def body(c, _):
            cn = jnp.sum(c * c, axis=1)
            cross = jnp.dot(x_local, c.T, preferred_element_type=jnp.float32)
            partial = cn[None, :] - 2.0 * cross
            codes = jnp.argmin(partial, axis=1)
            onehot = jax.nn.one_hot(codes, k, dtype=jnp.float32) * w_local[:, None]
            # per-shard partial stats -> global via psum over ICI
            sums = jax.lax.psum(jnp.dot(onehot.T, x_local,
                                        preferred_element_type=jnp.float32), axis)
            counts = jax.lax.psum(jnp.sum(onehot, axis=0), axis)
            new_c = sums / jnp.maximum(counts, 1.0)[:, None]
            new_c = jnp.where(counts[:, None] > 0, new_c, c)
            if spherical:
                new_c = l2_normalize(new_c)
            return new_c, None

        c, _ = jax.lax.scan(body, c0, None, length=niter)
        # final inertia of the returned centroids
        cn = jnp.sum(c * c, axis=1)
        cross = jnp.dot(x_local, c.T, preferred_element_type=jnp.float32)
        best = jnp.min(cn[None, :] - 2.0 * cross, axis=1)
        xn = jnp.sum(x_local * x_local, axis=1)
        inertia = jax.lax.psum(jnp.sum(jnp.maximum(best + xn, 0.0) * w_local), axis)
        return c, inertia

    f = jax.jit(jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(axis, None), P(axis), P()),
        out_specs=(P(), P()),
        check_vma=False,
    ))
    return f(x_sharded, weights_sharded, init_centroids)


def kmeans_fit_sharded(
    x: np.ndarray,
    k: int,
    mesh: Mesh,
    *,
    niter: int = 25,
    nredo: int = 3,
    seed: int = 42,
    spherical: bool = False,
    axis: str = "data",
) -> Tuple[np.ndarray, float]:
    """Host-facing distributed codebook training (faiss.Kmeans semantics,
    kmeans_faiss.py:29-41, scaled over the mesh). Pads and shards the
    points, runs ``nredo`` restarts, returns the best centroids."""
    x = np.asarray(x, np.float32)
    if spherical:
        x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    n, d = x.shape
    n_shards = mesh.shape[axis]
    npad = ((n + n_shards - 1) // n_shards) * n_shards
    xp = np.zeros((npad, d), np.float32)
    xp[:n] = x
    w = np.zeros((npad,), np.float32)
    w[:n] = 1.0

    sh = NamedSharding(mesh, P(axis, None))
    xs = jax.device_put(jnp.asarray(xp), sh)
    ws = jax.device_put(jnp.asarray(w), NamedSharding(mesh, P(axis)))

    keys = jax.random.split(jax.random.PRNGKey(seed), nredo)
    best_c, best_inertia = None, np.inf
    for r in range(nredo):
        init = _random_init(keys[r], jnp.asarray(x), k)
        if spherical:
            init = l2_normalize(init)
        init = jax.device_put(init, NamedSharding(mesh, P()))
        c, inertia = lloyd_sharded(xs, ws, init, k, mesh, niter=niter,
                                   spherical=spherical, axis=axis)
        if float(inertia) < best_inertia:
            best_c, best_inertia = np.asarray(c), float(inertia)
    return best_c, best_inertia
