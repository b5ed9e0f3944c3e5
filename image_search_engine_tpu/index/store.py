"""HBM-resident vector store with optional ICI row-sharding.

The array substrate under every index type: an (Npad, d) f32 device array,
cached squared norms (poisoned to PAD_NORM at padding rows — see
parallel/topk.py), and a host-side id->path sidecar (the reference keeps
this as images.csv, backend/siamese/utils.py:57-70).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from image_search_engine_tpu.parallel.mesh import replicate, shard_rows
from image_search_engine_tpu.parallel.topk import PAD_NORM


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@dataclasses.dataclass
class VectorStore:
    vectors: jax.Array  # (Npad, d)
    norms: jax.Array  # (Npad,) squared norms; PAD_NORM on pad rows
    n: int  # valid rows
    mesh: Optional[Mesh] = None
    axis: str = "data"

    @property
    def dim(self) -> int:
        return self.vectors.shape[1]

    @property
    def n_padded(self) -> int:
        return self.vectors.shape[0]

    @classmethod
    def build(
        cls,
        x: np.ndarray,
        mesh: Optional[Mesh] = None,
        axis: str = "data",
        pad_multiple: int = 8,
    ) -> "VectorStore":
        """Build from host rows; pads to the mesh size (and ``pad_multiple``)
        and shards row-wise if a mesh is given."""
        x = np.asarray(x, np.float32)
        n, d = x.shape
        mult = pad_multiple
        if mesh is not None:
            mult = np.lcm(mult, mesh.shape[axis])
        npad = _round_up(max(n, 1), mult)
        xp = np.zeros((npad, d), np.float32)
        xp[:n] = x
        norms = np.full((npad,), PAD_NORM, np.float32)
        norms[:n] = (x.astype(np.float64) ** 2).sum(1).astype(np.float32)
        if mesh is not None:
            vec = shard_rows(jnp.asarray(xp), mesh, axis)
            nrm = shard_rows(jnp.asarray(norms), mesh, axis)
        else:
            vec = jnp.asarray(xp)
            nrm = jnp.asarray(norms)
        return cls(vectors=vec, norms=nrm, n=n, mesh=mesh, axis=axis)

    def to_host(self) -> np.ndarray:
        """Valid rows as a host array."""
        return np.asarray(self.vectors)[: self.n]
