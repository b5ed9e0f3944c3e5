"""Vector indexes: HBM-resident flat exact search, IVF cell-probe, and
IVF-PQ — the Faiss-index replacements (reference backend/utils.py:293-330),
all pure JAX/Pallas with numpy-archive serialization."""
