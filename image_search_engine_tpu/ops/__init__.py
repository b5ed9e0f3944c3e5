"""TPU compute ops: distances, top-k search, k-means, histograms, BM25,
image preprocessing, and dense descriptors — pure JAX reference paths plus
Pallas kernels for the hot loops."""
