"""K-means codebook training — Lloyd's iterations under jit.

Replaces the reference's ``faiss.Kmeans`` wrapper (backend/kmeans_faiss.py:
5-50: seed=42, niter=25, nredo=3, spherical=True) with a TPU-native trainer:

  * assignment = one (N, d) x (d, K) distance matmul on the MXU + argmin
    (the Pallas fused version lives in ops/kmeans_pallas.py and plugs in
    behind the same ``assign`` contract);
  * update = unsorted segment-sum of points into centroid accumulators;
  * spherical mode L2-renormalizes centroids every iteration (Faiss
    spherical k-means semantics);
  * empty clusters keep their previous centroid (Faiss instead splits large
    clusters; keeping the centroid is deterministic and jit-friendly, and
    converges to the same inertia regime);
  * ``nredo`` restarts run from distinct random inits; the best (lowest
    final inertia) wins;
  * multi-chip: points sharded over the mesh data axis; per-shard partial
    sums are combined with ``psum`` inside shard_map (see
    parallel/distributed.py).

The public surface mirrors the reference's sklearn-style FaissKMeans:
``KMeans(k).fit(x)`` exposing ``cluster_centers_`` / ``inertia_`` and
``transform(x)`` = nearest-centroid codes.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from image_search_engine_tpu.ops.distances import l2_normalize


def assign_jax(x: jnp.ndarray, centroids: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Nearest-centroid assignment: argmin_j ||x_i - c_j||^2.

    Uses -2*x.C^T + ||c||^2 (the ||x||^2 term is constant per row and does
    not affect the argmin); the returned distance re-adds it so callers get
    true squared distances.

    Returns:
      (codes (N,) int32, sq_dists (N,) f32)
    """
    cn = jnp.sum(centroids * centroids, axis=1)  # (K,)
    cross = jnp.dot(x, centroids.T, preferred_element_type=jnp.float32)  # (N, K)
    partial = cn[None, :] - 2.0 * cross
    codes = jnp.argmin(partial, axis=1).astype(jnp.int32)
    xn = jnp.sum(x * x, axis=1)
    best = jnp.min(partial, axis=1) + xn
    return codes, jnp.maximum(best, 0.0)


def _update(x, codes, k, prev_centroids):
    """Centroid update: mean of assigned points; empty clusters keep prev.

    Accumulates via a one-hot MXU matmul rather than segment_sum: TPU
    scatter-add serializes (~10.6 of the 16.9 ms/iter at 1M x 128,
    k=512), while the (N, k) one-hot einsum rides the systolic array —
    whole Lloyd step 3.3 ms/iter, 5x (BENCH_NOTES "Codebook training").
    Stats stay f32: the step is bound on streaming x from HBM, so bf16
    one-hots measured the same speed (5.0 vs 5.1 ms/iter at k=1024) and
    f32 keeps segment_sum-level precision (sums differ only in summation
    order; counts exact to 2^24 rows/cluster). Same stat shape as the
    distributed trainer's psum partials (parallel/kmeans.py:55-59).
    """
    oh = jax.nn.one_hot(codes, k, dtype=jnp.float32)
    sums = jnp.einsum("nk,nd->kd", oh, x,
                      preferred_element_type=jnp.float32)
    counts = jnp.einsum("nk->k", oh)
    new = sums / jnp.maximum(counts, 1.0)[:, None]
    return jnp.where(counts[:, None] > 0, new, prev_centroids), counts


@functools.partial(
    jax.jit, static_argnames=("k", "niter", "spherical", "assign_fn")
)
def lloyd(
    x: jnp.ndarray,
    init_centroids: jnp.ndarray,
    k: int,
    niter: int = 25,
    spherical: bool = False,
    assign_fn: Optional[Callable] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Run ``niter`` Lloyd iterations from ``init_centroids``.

    Returns (centroids (k, d), inertia scalar = sum of squared distances).
    """
    assign = assign_fn or assign_jax

    def body(c, _):
        codes, dists = assign(x, c)
        new_c, _counts = _update(x, codes, k, c)
        if spherical:
            new_c = l2_normalize(new_c)
        return new_c, jnp.sum(dists)

    centroids, inertias = jax.lax.scan(body, init_centroids, None, length=niter)
    # One final assignment to report the inertia of the *returned* centroids.
    _, dists = assign(x, centroids)
    return centroids, jnp.sum(dists)


def _random_init(key, x, k):
    """Sample k distinct rows as initial centroids (Faiss-style init)."""
    n = x.shape[0]
    idx = jax.random.choice(key, n, shape=(k,), replace=n < k)
    return x[idx]


def kmeans_fit(
    x: jnp.ndarray,
    k: int,
    *,
    niter: int = 25,
    nredo: int = 3,
    seed: int = 42,
    spherical: bool = False,
    assign_fn: Optional[Callable] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Full codebook training with restarts (faiss.Kmeans semantics).

    Returns (best centroids (k, d), best inertia).
    """
    x = jnp.asarray(x, jnp.float32)
    if spherical:
        x = l2_normalize(x)
    keys = jax.random.split(jax.random.PRNGKey(seed), nredo)
    best_c, best_inertia = None, jnp.inf
    for r in range(nredo):
        init = _random_init(keys[r], x, k)
        if spherical:
            init = l2_normalize(init)
        c, inertia = lloyd(x, init, k, niter=niter, spherical=spherical, assign_fn=assign_fn)
        if best_c is None or float(inertia) < float(best_inertia):
            best_c, best_inertia = c, inertia
    return best_c, best_inertia


@functools.partial(jax.jit, static_argnames=("k", "niter", "chunk"))
def subspace_kmeans(
    resid: jnp.ndarray,
    k: int = 256,
    niter: int = 20,
    seed: int = 42,
    chunk: int = 65536,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Train ALL m product-quantizer codebooks in one vmapped program.

    PQ training runs an independent small k-means per subspace; doing
    them as m serial ``KMeans.fit`` calls costs m host round-trips +
    dispatch overhead per iteration (a 1M x 128 / m=16 IVFPQ build
    measured ~25 min, ~90 s per subspace). Here Lloyd's iterations vmap
    over the subspace axis and the assignment scan is chunked over N so
    the per-step score matrix is (m, chunk, k) — one compile, one
    dispatch for the whole trainer.

    Args:
      resid: (N, m, dsub) residuals.
      k: codewords per subspace (<= 256 for 8-bit codes).
      niter: Lloyd iterations.
      chunk: rows per assignment chunk (memory knob).
    Returns:
      (books (m, k, dsub) f32, codes (N, m) int32).
    """
    x = jnp.swapaxes(jnp.asarray(resid, jnp.float32), 0, 1)  # (m, N, dsub)
    m, n, dsub = x.shape
    chunk = min(chunk, ((n + 1023) // 1024) * 1024)  # small-N: one chunk
    npad = ((n + chunk - 1) // chunk) * chunk
    xp = jnp.pad(x, ((0, 0), (0, npad - n), (0, 0)))
    # pad rows get the sentinel segment k, dropped from every stat
    valid = (jnp.arange(npad) < n)
    xc = xp.reshape(m, npad // chunk, chunk, dsub)
    vc = valid.reshape(npad // chunk, chunk)

    keys = jax.random.split(jax.random.PRNGKey(seed), m)
    inits = jax.vmap(
        lambda xm, kk: xm[jax.random.choice(kk, n, shape=(k,), replace=n < k)]
    )(x, keys)

    def run_one(x_chunks, init):
        def body(c, _):
            def chunk_step(carry, inp):
                sums, counts = carry
                xcb, vb = inp
                codes, _ = assign_jax(xcb, c)
                # one-hot matmul accumulation (see _update: TPU
                # scatter-add serializes; the MXU einsum doesn't) —
                # pad rows contribute a zero one-hot row instead of a
                # sentinel segment
                oh = jax.nn.one_hot(codes, k, dtype=jnp.float32)
                oh = oh * vb[:, None].astype(jnp.float32)
                sums = sums + jnp.einsum(
                    "nk,nd->kd", oh, xcb,
                    preferred_element_type=jnp.float32)
                counts = counts + jnp.einsum("nk->k", oh)
                return (sums, counts), None

            (sums, counts), _ = jax.lax.scan(
                chunk_step,
                (jnp.zeros((k, dsub)), jnp.zeros((k,))),
                (x_chunks, vc),
            )
            new_c = sums / jnp.maximum(counts, 1.0)[:, None]
            return jnp.where(counts[:, None] > 0, new_c, c), None

        c, _ = jax.lax.scan(body, init, None, length=niter)

        def code_step(_, inp):
            xcb, _vb = inp
            codes, _ = assign_jax(xcb, c)
            return None, codes

        _, codes = jax.lax.scan(code_step, None, (x_chunks, vc))
        return c, codes.reshape(-1)[:n]

    books, codes = jax.vmap(run_one)(xc, inits)  # (m, k, dsub), (m, n)
    return books, jnp.swapaxes(codes, 0, 1).astype(jnp.int32)


@dataclasses.dataclass
class KMeans:
    """sklearn-style facade mirroring the reference's FaissKMeans
    (backend/kmeans_faiss.py:5-50): fit/transform, ``cluster_centers_``,
    ``inertia_``; ``transform`` returns nearest-centroid codes (the k=1
    search at kmeans_faiss.py:49)."""

    n_clusters: int
    niter: int = 25
    nredo: int = 3
    seed: int = 42
    spherical: bool = True
    assign_fn: Optional[Callable] = None

    cluster_centers_: Optional[np.ndarray] = None
    inertia_: Optional[float] = None

    def fit(self, x) -> "KMeans":
        c, inertia = kmeans_fit(
            jnp.asarray(x, jnp.float32),
            self.n_clusters,
            niter=self.niter,
            nredo=self.nredo,
            seed=self.seed,
            spherical=self.spherical,
            assign_fn=self.assign_fn,
        )
        self.cluster_centers_ = np.asarray(c)
        self.inertia_ = float(inertia)
        return self

    def transform(self, x) -> np.ndarray:
        """Quantize rows to nearest-centroid codes, shape (N, 1) to match the
        reference's index.search(x, 1) label output."""
        assert self.cluster_centers_ is not None, "fit first"
        q = jnp.asarray(x, jnp.float32)
        if self.spherical:
            q = l2_normalize(q)
        assign = self.assign_fn or assign_jax
        codes, _ = assign(q, jnp.asarray(self.cluster_centers_))
        return np.asarray(codes)[:, None]

    def fit_transform(self, x) -> np.ndarray:
        return self.fit(x).transform(x)
