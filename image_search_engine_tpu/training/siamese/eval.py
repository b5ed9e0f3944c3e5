"""Index evaluation harness.

Reference parity: backend/siamese/test_index.py — ``query_index`` runs the
same query through Faiss and through an explicit brute-force NumPy loop
(:49-71, the repo's one real correctness oracle), and
``display_query_results`` renders a matplotlib grid (:18-46). Here the
cross-check is first-class (flat-index vs NumPy), and the grid rendering is
kept behind an optional matplotlib import.
"""

from __future__ import annotations

from pathlib import Path
from typing import Sequence, Tuple

import numpy as np

from image_search_engine_tpu.index.flat import FlatIndex


def query_index(
    query_emb: np.ndarray,
    index: FlatIndex | np.ndarray,
    backend: str = "flat",
    k: int = 9,
) -> Tuple[np.ndarray, np.ndarray]:
    """Search with either the real index or the brute-force oracle.

    backend="flat": FlatIndex IP search (reference's faiss branch,
    test_index.py:52-56). backend="bruteforce": per-row L2 over a raw
    embedding matrix + argsort (the "dict" branch, :58-69).
    """
    q = np.atleast_2d(np.asarray(query_emb, np.float32))
    q = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
    if backend == "flat":
        assert isinstance(index, FlatIndex)
        return index.search(q, k)
    if backend == "bruteforce":
        mat = np.asarray(index, np.float32)
        d = np.linalg.norm(mat[None, :, :] - q[:, None, :], axis=2)
        idx = np.argsort(d, axis=1, kind="stable")[:, :k]
        return np.take_along_axis(d, idx, axis=1), idx
    raise ValueError(f"unknown backend {backend!r}")


def recall_at_k(got: np.ndarray, want: np.ndarray) -> float:
    hits = sum(len(set(g.tolist()) & set(w.tolist())) for g, w in zip(got, want))
    return hits / want.size


def display_query_results(
    query_image: np.ndarray,
    result_images: Sequence[np.ndarray],
    distances: Sequence[float],
    out_path: str | Path | None = None,
):
    """Matplotlib grid of query + top-k results with distances (reference
    display_query_results, test_index.py:18-46). Optional dependency."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    n = len(result_images) + 1
    cols = min(n, 5)
    rows = -(-n // cols)
    fig, axes = plt.subplots(rows, cols, figsize=(3 * cols, 3 * rows))
    axes = np.atleast_1d(axes).ravel()
    axes[0].imshow(query_image)
    axes[0].set_title("query")
    for i, (img, d) in enumerate(zip(result_images, distances), start=1):
        axes[i].imshow(img)
        axes[i].set_title(f"{d:.3f}")
    for ax in axes:
        ax.axis("off")
    if out_path:
        fig.savefig(out_path, bbox_inches="tight")
        plt.close(fig)
        return out_path
    return fig
