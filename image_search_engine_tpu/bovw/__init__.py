"""Bag-of-Visual-Words: codebook training, codeword histograms, BM25
weighting, cluster-quality scoring, and the fit/transform pipeline."""
