"""Okapi BM25 / tf-idf weighting for codeword histograms.

Dense-array re-implementation of the reference's ``OkapiTransformer``
(backend/utils.py:100-219). BoVW histograms here are dense (B, K) device
arrays (K = codebook size), so the sparse-CSR plumbing disappears and the
math becomes a few fused VPU ops under jit.

Reference-semantics notes (verified against backend/utils.py):
  * ``fit`` learns idf = log((N - df + 0.5) / (df + 0.5)) where df counts
    documents containing each codeword (utils.py:141) — exposed as ``idf_``.
  * ``transform`` applies ONLY the BM25 saturation
        out = k1*x / (k1*x + k2*(1 - b + b*dl/avgdl))
    (utils.py:199-200); the learned idf is *not* multiplied in — we keep
    that behavior by default for parity and offer ``apply_idf=True`` as an
    opt-in correction.
  * ``avgdl`` is recomputed from each transform batch (utils.py:196). For a
    single-image query batch that degenerates to dl/avgdl == 1; pass
    ``use_train_avgdl=True`` to reuse the corpus statistic instead.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def idf_fit(hist: jnp.ndarray) -> jnp.ndarray:
    """Learn per-codeword idf from a (N, K) count matrix."""
    n = hist.shape[0]
    df = jnp.sum(hist > 0, axis=0).astype(jnp.float32)  # (K,)
    return jnp.log((n - df + 0.5) / (df + 0.5))


@functools.partial(jax.jit, static_argnames=("k1", "k2", "b"))
def bm25_transform(
    hist: jnp.ndarray,
    k1: float = 1.0,
    k2: float = 1.0,
    b: float = 0.75,
    avgdl: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """BM25 saturation over a (B, K) count matrix."""
    x = hist.astype(jnp.float32)
    dl = jnp.sum(x, axis=1, keepdims=True)  # (B, 1)
    if avgdl is None:
        avgdl = jnp.mean(dl)
    denom_add = k2 * (1.0 - b + b * dl / jnp.maximum(avgdl, 1e-12))
    num = k1 * x
    out = num / (num + denom_add)
    # zero counts stay exactly zero (0/denom == 0 already, but guard NaNs
    # from an all-empty histogram where denom_add could be 0*inf)
    return jnp.where(x > 0, out, 0.0)


@dataclasses.dataclass
class OkapiBM25:
    """Fit/transform facade with the reference transformer's surface."""

    k1: float = 1.0
    k2: float = 1.0
    b: float = 0.75
    use_idf: bool = True
    apply_idf: bool = False  # reference never multiplies idf in transform
    use_train_avgdl: bool = False

    idf_: Optional[np.ndarray] = None
    avgdl_: Optional[float] = None

    def fit(self, hist) -> "OkapiBM25":
        h = jnp.asarray(hist, jnp.float32)
        if self.use_idf:
            self.idf_ = np.asarray(idf_fit(h))
        self.avgdl_ = float(jnp.mean(jnp.sum(h, axis=1)))
        return self

    def transform(self, hist) -> np.ndarray:
        h = jnp.asarray(hist, jnp.float32)
        avgdl = jnp.float32(self.avgdl_) if (self.use_train_avgdl and self.avgdl_) else None
        out = bm25_transform(h, self.k1, self.k2, self.b, avgdl=avgdl)
        if self.apply_idf:
            assert self.idf_ is not None, "fit first (use_idf=True)"
            out = out * jnp.asarray(self.idf_)[None, :]
        return np.asarray(out)

    def fit_transform(self, hist) -> np.ndarray:
        return self.fit(hist).transform(hist)
