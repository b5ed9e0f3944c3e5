"""Pairwise distances and exact top-k search — pure JAX reference path.

Replaces the reference's Faiss flat indexes (``faiss.IndexFlatL2`` /
``IndexFlatIP`` built in backend/utils.py:293-330 and searched at
backend/engine.py:55) with jitted matmul-based distance computation on the
MXU. The Pallas fused kernel in ``ops/topk_pallas.py`` implements the same
contract; this module is the correctness oracle it is tested against.

Conventions:
  * "score" is *smaller-is-better* internally (L2 squared distance, or the
    negated inner product for IP/cosine) so one top-k code path serves all
    metrics; public APIs return distances in the metric's natural sign,
    matching Faiss semantics (L2 -> squared distance ascending, IP/cosine ->
    inner product descending).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


def l2_normalize(x: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    """Row-wise L2 normalization (reference: faiss.normalize_L2 call sites,
    backend/utils.py:303, backend/engine.py:53)."""
    norm = jnp.sqrt(jnp.sum(x * x, axis=axis, keepdims=True))
    return x / jnp.maximum(norm, eps)


def pairwise_sq_l2(q: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Squared L2 distances between query rows and store rows.

    Uses the ||q||^2 - 2 q.x + ||x||^2 expansion so the dominant cost is a
    single (Q,d)x(d,N) matmul on the MXU.

    Args:
      q: (Q, d) queries.
      x: (N, d) store.
    Returns:
      (Q, N) squared distances (clamped at 0 against fp cancellation).
    """
    qn = jnp.sum(q * q, axis=-1, keepdims=True)  # (Q, 1)
    xn = jnp.sum(x * x, axis=-1)  # (N,)
    cross = jnp.dot(q, x.T, preferred_element_type=jnp.float32)  # (Q, N)
    return jnp.maximum(qn - 2.0 * cross + xn[None, :], 0.0)


def pairwise_ip(q: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Inner products between query rows and store rows: (Q, N)."""
    return jnp.dot(q, x.T, preferred_element_type=jnp.float32)


def pairwise_cosine(q: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Cosine similarity; equals IP over pre-normalized rows (the
    reference's "cosine" index is normalize_L2 + IndexFlatIP,
    backend/utils.py:300-303)."""
    return pairwise_ip(l2_normalize(q), l2_normalize(x))


def pairwise_chi2(q: jnp.ndarray, x: jnp.ndarray, eps: float = 1e-10) -> jnp.ndarray:
    """Chi-square distance between histogram rows.

    d(a, b) = 0.5 * sum_i (a_i - b_i)^2 / (a_i + b_i + eps)
    (reference: chi2_distance, backend/utils.py:91-97). O(Q*N*d) elementwise —
    meant for BoVW histograms where d is the codebook size.
    """
    diff = q[:, None, :] - x[None, :, :]
    denom = q[:, None, :] + x[None, :, :] + eps
    return 0.5 * jnp.sum(diff * diff / denom, axis=-1)


_METRIC_FNS = {
    "l2": pairwise_sq_l2,
    "ip": pairwise_ip,
    "cosine": pairwise_cosine,
    "chi2": pairwise_chi2,
}

#: metrics where larger is better (returned distances are descending)
_DESCENDING = frozenset({"ip", "cosine"})


def pairwise(q: jnp.ndarray, x: jnp.ndarray, metric: str) -> jnp.ndarray:
    try:
        return _METRIC_FNS[metric](q, x)
    except KeyError:
        raise ValueError(f"unknown metric {metric!r}; want one of {sorted(_METRIC_FNS)}")


@functools.partial(jax.jit, static_argnames=("k", "metric"))
def topk_flat(
    q: jnp.ndarray, x: jnp.ndarray, k: int, metric: str = "l2"
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact k-NN over a flat store: the ``index.search(q, k)`` contract.

    Args:
      q: (Q, d) query rows.
      x: (N, d) store rows.
      k: neighbors to return.
      metric: "l2" | "ip" | "cosine" | "chi2".
    Returns:
      (distances (Q, k), indices (Q, k)); distances ascending for l2/chi2,
      descending for ip/cosine — matching Faiss IndexFlatL2/IndexFlatIP.
    """
    d = pairwise(q, x, metric)
    if metric in _DESCENDING:
        vals, idx = jax.lax.top_k(d, k)
        return vals, idx
    vals, idx = jax.lax.top_k(-d, k)
    return -vals, idx


def topk_flat_chunked(
    q: jnp.ndarray, x: jnp.ndarray, k: int, metric: str = "l2", chunk: int = 65536
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact k-NN with the store streamed in N-chunks.

    Bounds the (Q, N) distance matrix to (Q, chunk) so arbitrarily large
    stores fit in memory: per-chunk top-k, then a final merge. Same results
    as :func:`topk_flat`.
    """
    n = x.shape[0]
    if n <= chunk:
        return topk_flat(q, x, k, metric)

    num_chunks = -(-n // chunk)
    pad = num_chunks * chunk - n
    # Pad with rows that can never win (inf distance / -inf similarity).
    xp = jnp.pad(x, ((0, pad), (0, 0)))
    xp = xp.reshape(num_chunks, chunk, x.shape[1])
    valid = jnp.arange(num_chunks * chunk).reshape(num_chunks, chunk) < n

    desc = metric in _DESCENDING
    kk = min(k, chunk)

    def scan_body(carry, inp):
        xc, vmask, base = inp
        d = pairwise(q, xc, metric)
        bad = jnp.float32(-jnp.inf) if desc else jnp.float32(jnp.inf)
        d = jnp.where(vmask[None, :], d, bad)
        s = d if desc else -d
        vals, idx = jax.lax.top_k(s, kk)
        return carry, (vals, idx + base)

    _, (vals, idx) = jax.lax.scan(
        scan_body, None, (xp, valid, jnp.arange(num_chunks) * chunk)
    )
    # (num_chunks, Q, kk) -> (Q, num_chunks*kk) merge
    vals = jnp.swapaxes(vals, 0, 1).reshape(q.shape[0], -1)
    idx = jnp.swapaxes(idx, 0, 1).reshape(q.shape[0], -1)
    mvals, mpos = jax.lax.top_k(vals, k)
    midx = jnp.take_along_axis(idx, mpos, axis=1)
    return (mvals if desc else -mvals), midx
