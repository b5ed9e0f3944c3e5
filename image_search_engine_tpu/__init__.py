"""image_search_engine_tpu — a TPU-native image index-and-query engine.

Built from scratch in JAX/XLA/Pallas with the capability surface of the
reference `ManuelZ/image-search-engine` (see SURVEY.md): feature extraction
(CNN embeddings, dense keypoint descriptors, perceptual hashes), BoVW
codebook training (Pallas Lloyd's-iteration k-means), tf-idf/BM25 weighting,
exact-flat and IVF nearest-neighbor search (fused distance+top-k Pallas
kernels over an HBM-resident, ICI-sharded vector store), an offline indexer
CLI, an HTTP query server, and a siamese metric-learning trainer.

The compute path is pure JAX (jit/pjit/shard_map + Pallas kernels); no CPU
Faiss anywhere.
"""

__version__ = "0.1.0"

from image_search_engine_tpu.config import Config, Method, DnnModel, IndexType  # noqa: F401
