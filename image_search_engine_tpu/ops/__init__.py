"""TPU compute ops: distances, top-k search, k-means, histograms, BM25,
image preprocessing, and dense descriptors — pure JAX reference paths plus
Pallas kernels for the hot loops."""


def round_up(x: int, m: int) -> int:
    """Smallest multiple of ``m`` >= ``x`` (shared tile/pad helper)."""
    return ((x + m - 1) // m) * m
