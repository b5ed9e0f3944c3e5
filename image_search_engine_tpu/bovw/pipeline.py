"""BoVW modelling pipeline: codebook + histograms + BM25.

Replaces the reference's sklearn ``Pipeline([("bovw", BOVW), ("tfidf",
OkapiTransformer)])`` stack (backend/bag_of_visual_words.py:40-216) with a
TPU-shaped equivalent:

  * ``fit``: train a spherical k-means codebook on every valid descriptor
    (ops/kmeans.py — Lloyd's under jit, Pallas assign on TPU; reference
    used faiss.Kmeans, kmeans_faiss.py:29-41), quantize all descriptors in
    one sweep, scatter codeword histograms (ops/histogram.py; reference
    looped np.histogram per image over joblib threads, bag_of_visual_words
    .py:98-113), fit BM25 stats (ops/bm25.py);
  * ``transform``: quantize -> histogram -> BM25-saturate, one jitted path
    for a whole batch — this is also the query-time path, with no disk
    round-trip (the reference wrote the query to a temp PNG, engine.py:93-98);
  * optional codebook-size sweep scored by sampled Davies-Bouldin
    (reference GridSearchCV + calc_sampled_cluster_score, bag_of_visual_
    words.py:161-171, utils.py:235-290);
  * artifacts serialize to one ``.npz`` (reference had to strip unpicklable
    Faiss objects from the pipeline, bag_of_visual_words.py:199-204 — a
    codebook here is just an array).
"""

from __future__ import annotations

import dataclasses
import json
import logging
from pathlib import Path
from typing import Optional, Sequence, Tuple

import jax
import numpy as np

from image_search_engine_tpu.config import Config
from image_search_engine_tpu.ops.bm25 import OkapiBM25
from image_search_engine_tpu.ops.histogram import batched_histograms
from image_search_engine_tpu.ops.kmeans import KMeans

log = logging.getLogger(__name__)


def flatten_valid_descriptors(features: np.ndarray, valid: Optional[np.ndarray]) -> np.ndarray:
    """(B, K, D) + (B, K) mask -> (T, D) rows of real descriptors."""
    if valid is None:
        return features.reshape(-1, features.shape[-1])
    return features[valid]


def davies_bouldin_score(x: np.ndarray, labels: np.ndarray) -> float:
    """Davies-Bouldin index in plain NumPy (lower = tighter clusters).

    Mirrors sklearn.metrics.davies_bouldin_score so the production
    ``--cluster-grid-search`` path carries no scikit-learn dependency
    (it was only declared in the test extra). Per-cluster dispersion
    S_i = mean L2 distance to the centroid; score = mean over i of
    max_{j!=i} (S_i + S_j) / d(c_i, c_j). Parity-tested against sklearn
    in tests/test_bovw_math.py.
    """
    uniq = np.unique(labels)
    k = uniq.shape[0]
    if k < 2:
        raise ValueError("davies_bouldin_score needs >= 2 clusters")
    cents = np.empty((k, x.shape[1]), np.float64)
    disp = np.empty(k, np.float64)
    for i, u in enumerate(uniq):
        pts = x[labels == u].astype(np.float64)
        cents[i] = pts.mean(axis=0)
        disp[i] = np.sqrt(((pts - cents[i]) ** 2).sum(axis=1)).mean()
    # pairwise centroid distances
    diff = cents[:, None, :] - cents[None, :, :]
    dist = np.sqrt((diff ** 2).sum(-1))
    ratio = (disp[:, None] + disp[None, :]) / np.where(dist > 0, dist, np.inf)
    np.fill_diagonal(ratio, 0.0)
    return float(ratio.max(axis=1).mean())


def sampled_cluster_score(
    descriptors: np.ndarray,
    labels: np.ndarray,
    sample_size: int = 2000,
    repeats: int = 10,
    seed: int = 0,
) -> float:
    """Mean Davies-Bouldin over random subsamples, sign-flipped so higher is
    better (reference calc_sampled_cluster_score, backend/utils.py:235-290)."""
    rng = np.random.default_rng(seed)
    scores = []
    n = descriptors.shape[0]
    for _ in range(repeats):
        idx = rng.choice(n, size=min(sample_size, n), replace=False)
        if len(np.unique(labels[idx])) < 2:
            continue
        scores.append(-davies_bouldin_score(descriptors[idx], labels[idx]))
    return float(np.mean(scores)) if scores else -np.inf


@dataclasses.dataclass
class BoVWPipeline:
    """fit/transform: descriptor sets -> BM25-weighted codeword histograms."""

    n_clusters: int = 200
    kmeans_niter: int = 25
    kmeans_nredo: int = 3
    kmeans_seed: int = 42
    spherical: bool = True
    bm25_k1: float = 1.0
    bm25_k2: float = 1.0
    bm25_b: float = 0.75
    use_train_avgdl: bool = True  # sane query-time default (see ops/bm25.py)
    # descriptor provenance: recorded at fit time so the serving side can
    # reconstruct the SAME feature pipeline from the artifact alone (a
    # 136-D DAISY query against a 256-bit ORB codebook is a shape error)
    descriptor_kind: str = ""
    descriptor_params: Optional[dict] = None

    kmeans: Optional[KMeans] = None
    bm25: Optional[OkapiBM25] = None

    # -- training -------------------------------------------------------------
    def fit(self, features: np.ndarray, valid: Optional[np.ndarray]) -> "BoVWPipeline":
        rows = flatten_valid_descriptors(features, valid)
        log.info("training codebook: %d descriptors -> k=%d", rows.shape[0], self.n_clusters)
        self.kmeans = KMeans(
            n_clusters=self.n_clusters,
            niter=self.kmeans_niter,
            nredo=self.kmeans_nredo,
            seed=self.kmeans_seed,
            spherical=self.spherical,
        ).fit(rows)
        hist = self._histograms(features, valid)
        self.bm25 = OkapiBM25(
            k1=self.bm25_k1, k2=self.bm25_k2, b=self.bm25_b,
            use_train_avgdl=self.use_train_avgdl,
        ).fit(hist)
        return self

    def fit_transform(self, features, valid) -> np.ndarray:
        self.fit(features, valid)
        return self.transform(features, valid)

    # -- inference --------------------------------------------------------------
    def _histograms(self, features: np.ndarray, valid: Optional[np.ndarray]) -> np.ndarray:
        assert self.kmeans is not None, "fit first"
        b, k, d = features.shape
        codes = self.kmeans.transform(features.reshape(-1, d))[:, 0].reshape(b, k)
        if valid is None:
            valid = np.ones((b, k), bool)
        return np.asarray(batched_histograms(codes, valid, self.n_clusters))

    def transform(self, features: np.ndarray, valid: Optional[np.ndarray]) -> np.ndarray:
        """(B, K, D) descriptor sets -> (B, n_clusters) weighted histograms."""
        assert self.bm25 is not None, "fit first"
        return self.bm25.transform(self._histograms(features, valid))

    # -- persistence -----------------------------------------------------------
    def save(self, path: str | Path) -> None:
        assert self.kmeans is not None and self.bm25 is not None
        np.savez_compressed(
            path,
            centroids=self.kmeans.cluster_centers_,
            inertia=np.float64(self.kmeans.inertia_ or 0.0),
            idf=self.bm25.idf_ if self.bm25.idf_ is not None else np.zeros(0),
            avgdl=np.float64(self.bm25.avgdl_ or 0.0),
            params=np.asarray(
                [self.n_clusters, self.kmeans_niter, self.kmeans_nredo, self.kmeans_seed,
                 int(self.spherical), int(self.use_train_avgdl)], np.float64
            ),
            bm25_params=np.asarray([self.bm25_k1, self.bm25_k2, self.bm25_b], np.float64),
            descriptor_kind=np.array(self.descriptor_kind),
            descriptor_params=np.array(
                json.dumps(self.descriptor_params or {})
            ),
        )

    @classmethod
    def load(cls, path: str | Path) -> "BoVWPipeline":
        z = np.load(path, allow_pickle=False)
        p = z["params"]
        bp = z["bm25_params"]
        self = cls(
            n_clusters=int(p[0]), kmeans_niter=int(p[1]), kmeans_nredo=int(p[2]),
            kmeans_seed=int(p[3]), spherical=bool(p[4]), use_train_avgdl=bool(p[5]),
            bm25_k1=float(bp[0]), bm25_k2=float(bp[1]), bm25_b=float(bp[2]),
        )
        self.kmeans = KMeans(n_clusters=int(p[0]), spherical=bool(p[4]))
        self.kmeans.cluster_centers_ = z["centroids"]
        self.kmeans.inertia_ = float(z["inertia"])
        self.bm25 = OkapiBM25(
            k1=float(bp[0]), k2=float(bp[1]), b=float(bp[2]),
            use_train_avgdl=bool(p[5]),
        )
        self.bm25.idf_ = z["idf"] if z["idf"].size else None
        self.bm25.avgdl_ = float(z["avgdl"])
        if "descriptor_kind" in z.files:
            self.descriptor_kind = str(z["descriptor_kind"])
            self.descriptor_params = json.loads(str(z["descriptor_params"]))
        return self


def sweep_num_clusters(
    features: np.ndarray,
    valid: Optional[np.ndarray],
    candidates: Sequence[int],
    cfg: Optional[Config] = None,
    sample_size: int = 2000,
    repeats: int = 10,
) -> Tuple[int, dict]:
    """Codebook-size sweep scored by sampled Davies-Bouldin (reference
    GridSearchCV over bovw__n_clusters, bag_of_visual_words.py:161-171).

    Returns (best_k, {k: score}).
    """
    rows = flatten_valid_descriptors(features, valid)
    scores = {}
    for k in candidates:
        km = KMeans(n_clusters=int(k), niter=15, nredo=1, spherical=True).fit(rows)
        labels = km.transform(rows)[:, 0]
        scores[int(k)] = sampled_cluster_score(rows, labels, sample_size, repeats)
        log.info("n_clusters=%d -> sampled DB score %.4f", k, scores[int(k)])
    best = max(scores, key=scores.get)
    return best, scores
