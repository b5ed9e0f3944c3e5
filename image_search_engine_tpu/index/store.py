"""HBM-resident vector store with optional ICI row-sharding.

The array substrate under every index type: an (Npad, d) device array,
cached squared norms (poisoned to PAD_NORM at padding rows — see
parallel/topk.py), and a host-side id->path sidecar (the reference keeps
this as images.csv, backend/siamese/utils.py:57-70).

The store dtype trades HBM footprint/bandwidth for recall against the
original f32 vectors (the exact-search sweep is HBM-bandwidth-bound, so
throughput scales with it — see BENCH_NOTES.md):

  * "f32"  — exact, 4 bytes/dim (default; what the reference's Faiss
    IndexFlat holds, backend/utils.py:293-330)
  * "bf16" — 2 bytes/dim; search is exact over the rounded store
    (recall@10 ~0.994 vs f32 at 1M x 128)
  * "int8" — 1 byte/dim, symmetric per-row quantization; search is exact
    over the quantized store (recall@10 ~0.978 vs f32 at 1M x 128)

Norms are always computed from the *store values* (dequantized), so every
search phase scores one consistent set of vectors.
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

STORE_DTYPES = ("f32", "bf16", "int8")


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@dataclasses.dataclass
class VectorStore:
    vectors: jax.Array  # (Npad, d) f32 / bf16 / int8 codes
    norms: jax.Array  # (Npad,) squared norms of the store values; PAD_NORM on pad rows
    n: int  # valid rows
    mesh: Optional[Mesh] = None
    axis: str = "data"
    dtype: str = "f32"
    scales: Optional[jax.Array] = None  # (Npad,) per-row dequant scales (int8 only)

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
        dtype: str = "f32",
    ) -> "VectorStore":
        """Build from host rows; pads to the mesh size (and ``pad_multiple``)
        and shards row-wise if a mesh is given."""
        if dtype not in STORE_DTYPES:
            raise ValueError(f"store dtype must be one of {STORE_DTYPES}, got {dtype!r}")
        x = np.asarray(x, np.float32)
        n, d = x.shape
        mult = pad_multiple
        if mesh is not None:
            mult = np.lcm(mult, mesh.shape[axis])
        npad = _round_up(max(n, 1), mult)
        xp = np.zeros((npad, d), np.float32)
        xp[:n] = x

        scales_arr: Optional[np.ndarray] = None
        if dtype == "int8":
            # symmetric per-row quantization (ops/topk_pallas.quantize_store_int8
            # math, on host); pad rows quantize to 0 codes with scale 0
            amax = np.abs(xp).max(axis=1)
            scale = np.where(amax > 0, np.maximum(amax, 1e-12) / 127.0, 0.0).astype(np.float32)
            codes = np.clip(np.round(xp / np.where(scale > 0, scale, 1.0)[:, None]),
                            -127, 127).astype(np.int8)
            store_host: np.ndarray = codes
            store_true = codes.astype(np.float32) * scale[:, None]
            scales_arr = scale
        elif dtype == "bf16":
            store_host = np.asarray(jnp.asarray(xp, jnp.bfloat16))
            store_true = np.asarray(jnp.asarray(store_host), np.float32)
        else:
            store_host = xp
            store_true = xp

        norms = np.full((npad,), PAD_NORM, np.float32)
        norms[:n] = (store_true[:n].astype(np.float64) ** 2).sum(1).astype(np.float32)
        if mesh is not None:
            vec = shard_rows(jnp.asarray(store_host), mesh, axis)
            nrm = shard_rows(jnp.asarray(norms), mesh, axis)
            scl = None if scales_arr is None else shard_rows(jnp.asarray(scales_arr), mesh, axis)
        else:
            vec = jnp.asarray(store_host)
            nrm = jnp.asarray(norms)
            scl = None if scales_arr is None else jnp.asarray(scales_arr)
        return cls(vectors=vec, norms=nrm, n=n, mesh=mesh, axis=axis,
                   dtype=dtype, scales=scl)

    def to_host(self) -> np.ndarray:
        """Valid rows as a host f32 array (dequantized for int8; note that
        requantizing the result is lossy a second time)."""
        v = np.asarray(self.vectors)[: self.n]
        if self.dtype == "int8":
            return v.astype(np.float32) * np.asarray(self.scales)[: self.n, None]
        return v.astype(np.float32)

    def to_host_raw(self) -> tuple[np.ndarray, Optional[np.ndarray]]:
        """Valid rows in the store dtype plus scales (int8) — lossless
        round-trip for serialization."""
        v = np.asarray(self.vectors)[: self.n]
        s = None if self.scales is None else np.asarray(self.scales)[: self.n]
        return v, s
