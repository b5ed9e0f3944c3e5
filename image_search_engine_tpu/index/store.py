"""HBM-resident vector store with optional ICI row-sharding.

The array substrate under every index type: an (Npad, d) device array,
cached squared norms (poisoned to PAD_NORM at padding rows — see
parallel/topk.py), and a host-side id->path sidecar (the reference keeps
this as images.csv, backend/siamese/utils.py:57-70).

The store dtype trades HBM footprint for recall against the original f32
vectors:

  * "f32"  — exact, 4 bytes/dim (default; what the reference's Faiss
    IndexFlat holds, backend/utils.py:293-330)
  * "bf16" — 2 bytes/dim; search is exact over the rounded store
    (recall@10 ~0.994 vs f32 at 1M x 128)
  * "int8" — 1 byte/dim, symmetric per-row quantization; search is exact
    over the quantized store (recall@10 ~0.978 vs f32 at 1M x 128)

Throughput note (BENCH_NOTES.md): at the large-batch operating point the
fused two-phase search is MXU/dispatch-bound, not HBM-bound, so bf16 and
int8 measure within ~10% of each other — pick them for the footprint
(2x/4x), not for speed. Norms are always computed from the *store values*
(dequantized), so every search phase scores one consistent set of vectors.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from image_search_engine_tpu.config import STORE_DTYPES
from image_search_engine_tpu.parallel.mesh import replicate, shard_rows
from image_search_engine_tpu.parallel.topk import PAD_NORM
from image_search_engine_tpu.ops import round_up



def quantize_rows_int8(x: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Symmetric per-row int8 quantization on host — the same math as
    ``ops.topk_pallas.quantize_store_int8`` (kept in lockstep; a parity
    test pins them together). Returns (codes int8, scales f32) with
    x ~= codes * scales[:, None].

    Requantizing dequantized codes is EXACT: the row amax dequantizes to
    scale*127, so the recomputed scale and every code come back identical
    (zero rows: scale 1e-12/127, all-zero codes, dequant 0, same again).
    """
    x = np.asarray(x, np.float32)
    amax = np.abs(x).max(axis=1)
    scale = (np.maximum(amax, 1e-12) / 127.0).astype(np.float32)
    codes = np.clip(np.round(x / scale[:, None]), -127, 127).astype(np.int8)
    return codes, scale


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
        """Build from host f32 rows; pads to the mesh size (and
        ``pad_multiple``) and shards row-wise if a mesh is given."""
        if dtype not in STORE_DTYPES:
            raise ValueError(f"store dtype must be one of {STORE_DTYPES}, got {dtype!r}")
        x = np.asarray(x, np.float32)
        if dtype == "int8":
            codes, scales = quantize_rows_int8(x)
            return cls.from_quantized(codes, scales, mesh=mesh, axis=axis,
                                      pad_multiple=pad_multiple)

        n, d = x.shape
        npad = cls._npad(n, mesh, axis, pad_multiple)
        xp = np.zeros((npad, d), np.float32)
        xp[:n] = x
        if dtype == "bf16":
            store_host: np.ndarray = xp.astype(jnp.bfloat16)  # host ml_dtypes cast
            store_true = store_host.astype(np.float32)
        else:
            store_host = xp
            store_true = xp
        norms = np.full((npad,), PAD_NORM, np.float32)
        norms[:n] = (store_true[:n].astype(np.float64) ** 2).sum(1).astype(np.float32)
        vec, nrm, _ = cls._place(store_host, norms, None, mesh, axis)
        return cls(vectors=vec, norms=nrm, n=n, mesh=mesh, axis=axis, dtype=dtype)

    @classmethod
    def from_quantized(
        cls,
        codes: np.ndarray,
        scales: np.ndarray,
        mesh: Optional[Mesh] = None,
        axis: str = "data",
        pad_multiple: int = 8,
    ) -> "VectorStore":
        """Build an int8 store directly from (codes, scales) — no
        dequantize/requantize round-trip (index load path)."""
        codes = np.asarray(codes, np.int8)
        scales = np.asarray(scales, np.float32)
        n, d = codes.shape
        npad = cls._npad(n, mesh, axis, pad_multiple)
        cp = np.zeros((npad, d), np.int8)
        cp[:n] = codes
        sp = np.zeros((npad,), np.float32)
        sp[:n] = scales
        norms = np.full((npad,), PAD_NORM, np.float32)
        deq = codes.astype(np.float32) * scales[:, None]
        norms[:n] = (deq.astype(np.float64) ** 2).sum(1).astype(np.float32)
        vec, nrm, scl = cls._place(cp, norms, sp, mesh, axis)
        return cls(vectors=vec, norms=nrm, n=n, mesh=mesh, axis=axis,
                   dtype="int8", scales=scl)

    @staticmethod
    def _npad(n: int, mesh: Optional[Mesh], axis: str, pad_multiple: int) -> int:
        mult = pad_multiple
        if mesh is not None:
            mult = int(np.lcm(mult, mesh.shape[axis]))
        return round_up(max(n, 1), mult)

    @staticmethod
    def _place(vectors, norms, scales, mesh: Optional[Mesh], axis: str):
        if mesh is not None:
            vec = shard_rows(jnp.asarray(vectors), mesh, axis)
            nrm = shard_rows(jnp.asarray(norms), mesh, axis)
            scl = None if scales is None else shard_rows(jnp.asarray(scales), mesh, axis)
        else:
            vec = jnp.asarray(vectors)
            nrm = jnp.asarray(norms)
            scl = None if scales is None else jnp.asarray(scales)
        return vec, nrm, scl

    def to_host(self) -> np.ndarray:
        """Valid rows as a host f32 array (dequantized for int8 — an exact
        representation of the store values; see quantize_rows_int8 for why
        requantizing them round-trips losslessly)."""
        v = np.asarray(self.vectors)[: self.n]
        if self.dtype == "int8":
            return v.astype(np.float32) * np.asarray(self.scales)[: self.n, None]
        return v.astype(np.float32)

    def to_host_raw(self) -> Tuple[np.ndarray, Optional[np.ndarray]]:
        """Valid rows in the store dtype plus scales (int8) — lossless
        round-trip for serialization."""
        v = np.asarray(self.vectors)[: self.n]
        s = None if self.scales is None else np.asarray(self.scales)[: self.n]
        return v, s
