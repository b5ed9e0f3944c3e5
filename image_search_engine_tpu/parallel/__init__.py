"""Mesh/sharding layer: device meshes, ICI-sharded stores, distributed
top-k merge, distributed k-means, and data-parallel training utilities.

The reference has no distributed backend at all (SURVEY.md §2.3: joblib
threads only); this package is the TPU-native scale-out story mandated by
BASELINE.json — shard the (N, d) vector store row-wise across a 1-D mesh,
search shards locally, and merge candidates with XLA collectives over ICI.
"""
