"""Siamese metric-learning trainer: DenseNet-121 backbone + 128-D embedding
head, triplet/circle losses, augmentation-positive pairing, data-parallel
training over the mesh, best-val checkpointing with resume — the JAX
re-design of the reference's TF and PT variants (backend/siamese/)."""
