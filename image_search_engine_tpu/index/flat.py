"""Flat exact-search index: the IndexFlatL2 / IndexFlatIP / "cosine"
replacement (reference create_search_index, backend/utils.py:293-330, and
index.search at backend/engine.py:55).

One class serves all three reference index types:
  * "l2"     -> squared-L2 ascending (IndexFlatL2 semantics)
  * "ip"     -> inner product descending (IndexFlatIP)
  * "cosine" -> rows L2-normalized at add time, queries at search time,
                then IP (the reference's normalize_L2 + IndexFlatIP combo,
                utils.py:300-303)

Search runs the fused Pallas kernel per shard on TPU (ops/topk_pallas.py)
or the XLA matmul+top_k path elsewhere, with the cross-shard merge of
parallel/topk.py when the store is sharded. Serialization is a plain
``.npz`` (replacing faiss.write_index/read_index, e.g. engine.py:116,131).

``dtype`` picks the store precision ("f32" | "bf16" | "int8"): bf16/int8
cut the HBM footprint 2x/4x at recall@10 ~0.994/~0.978 vs the f32 corpus
(1M x 128 measurements, BENCH_NOTES.md); batched throughput is
MXU/dispatch-bound and lands within ~10% across precisions. Search stays
exact over the store values themselves (norms are store-true; int8
scores ride the MXU's native int8 path).
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from image_search_engine_tpu.index.store import VectorStore
from image_search_engine_tpu.ops.distances import l2_normalize
from image_search_engine_tpu.parallel.topk import distributed_topk, local_topk_with_norms

log = logging.getLogger(__name__)


class FlatIndex:
    """Exact k-NN index over an HBM-resident (optionally ICI-sharded) store."""

    metric_kind = "flat"

    def __init__(self, metric: str = "l2", mesh: Optional[Mesh] = None,
                 axis: str = "data", dtype: str = "f32"):
        if metric not in ("l2", "ip", "cosine", "chi2"):
            raise ValueError(f"unsupported metric {metric!r}")
        if metric == "chi2" and dtype != "f32":
            raise ValueError("chi2 searches f32 stores only")
        self.metric = metric
        self.mesh = mesh
        self.axis = axis
        self.dtype = dtype
        self.store: Optional[VectorStore] = None

    # -- Faiss-like surface -------------------------------------------------
    @property
    def ntotal(self) -> int:
        return 0 if self.store is None else self.store.n

    @property
    def d(self) -> int:
        assert self.store is not None
        return self.store.dim

    def add(self, x: np.ndarray) -> "FlatIndex":
        """Set the corpus (one-shot bulk add; append = rebuild, which at TPU
        speeds is cheaper than incremental-update machinery)."""
        x = np.asarray(x, np.float32)
        if self.metric == "cosine":
            x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
        if self.store is not None:
            x = np.concatenate([self.store.to_host(), x])
        self.store = VectorStore.build(x, mesh=self.mesh, axis=self.axis,
                                       dtype=self.dtype)
        return self

    def search(
        self, q: np.ndarray, k: int, use_pallas: Optional[bool] = None
    ) -> Tuple[np.ndarray, np.ndarray]:
        """k-NN search; returns (distances (Q, k), indices (Q, k)).

        Distances ascending for l2/chi2, descending for ip/cosine —
        matching Faiss. Indices of padding rows never appear; when
        k > ntotal the tail is filled with (-1, +/-inf), Faiss style.

        Exactness is machine-checked per dispatch on the Pallas path:
        the two-phase kernel emits a runtime certificate (k-th final
        distance vs the best unscanned group min, ops/topk_pallas.py);
        on the rare violation the dispatch transparently re-runs at a
        wide candidate margin. k > 128 falls back to the XLA full-scan
        path (the fused kernels' candidate machinery is sized for
        serving-scale k; the fallback is exact for any k, at full
        (Q, N) scan cost).
        """
        assert self.store is not None, "add() vectors first"
        q = jnp.asarray(q, jnp.float32)
        if q.ndim == 1:
            q = q[None, :]
        search_metric = self.metric
        if self.metric == "cosine":
            q = l2_normalize(q)
            search_metric = "ip"
        k_eff = min(k, self.store.n)
        if k_eff > 128 and use_pallas is None:
            use_pallas = False  # fused-kernel k cap; XLA scan handles any k
        WIDE = 32  # escalation margin for certificate violations
        if self.mesh is not None:
            # one device_get covers results AND certificate (a separate
            # certificate readback would double the per-call tunnel RTT)
            d, i, ok = jax.device_get(distributed_topk(
                q, self.store.vectors, self.store.norms, k_eff, search_metric,
                self.mesh, self.axis, use_pallas=use_pallas,
                scales_sharded=self.store.scales, with_certificate=True,
            ))
            if not ok.all():
                d, i, ok_wide = jax.device_get(distributed_topk(
                    q, self.store.vectors, self.store.norms, k_eff,
                    search_metric, self.mesh, self.axis, use_pallas=use_pallas,
                    scales_sharded=self.store.scales, with_certificate=True,
                    t_margin=WIDE,
                ))
                if not ok_wide.all():
                    # mirror topk_twophase_safe: a certificate that fails
                    # even at the wide margin means the exactness guarantee
                    # could not be restored — surface it, don't swallow it
                    log.error(
                        "sharded exactness certificate still failing after "
                        "wide-margin (%d) escalation on %d/%d queries",
                        WIDE, int((~np.asarray(ok_wide)).sum()), ok_wide.size,
                    )
        else:
            if use_pallas is None:
                use_pallas = jax.default_backend() == "tpu"
            if search_metric == "chi2":
                use_pallas = False
            if use_pallas:
                from image_search_engine_tpu.ops.topk_pallas import topk_twophase_safe

                d, i = topk_twophase_safe(
                    q, self.store.vectors, k_eff, search_metric,
                    x_norms=self.store.norms, x_scale=self.store.scales,
                    wide_margin=WIDE,
                )
            else:
                d, i = local_topk_with_norms(
                    q, self.store.vectors, self.store.norms, k_eff,
                    search_metric, False, scales=self.store.scales,
                )
        # Pallas/mesh branches already fetched above (one RTT including the
        # certificate); this only transfers for the XLA-fallback branch.
        d, i = jax.device_get((d, i))
        d, i = np.array(d)[:, :k], np.array(i)[:, :k]
        if d.shape[1] < k:  # k > ntotal: pad with Faiss's (-1, worst) tail
            pad = k - d.shape[1]
            worst = -np.inf if search_metric == "ip" else np.inf
            d = np.pad(d, ((0, 0), (0, pad)), constant_values=worst)
            i = np.pad(i, ((0, 0), (0, pad)), constant_values=-1)
        return d, i

    # -- serialization (replaces faiss.write_index/read_index) ---------------
    def save(self, path: str | Path) -> None:
        assert self.store is not None
        raw, scales = self.store.to_host_raw()
        payload = dict(
            metric=np.array(self.metric),
            kind=np.array(self.metric_kind),
            dtype=np.array(self.dtype),
        )
        if self.dtype == "bf16":
            # numpy archives don't speak ml_dtypes: round-trip as uint16 bits
            payload["vectors"] = raw.view(np.uint16)
        else:
            payload["vectors"] = raw
        if scales is not None:
            payload["scales"] = scales
        np.savez_compressed(path, **payload)

    @classmethod
    def load(
        cls, path: str | Path, mesh: Optional[Mesh] = None, axis: str = "data"
    ) -> "FlatIndex":
        import jax.numpy as jnp

        z = np.load(path, allow_pickle=False)
        dtype = str(z["dtype"]) if "dtype" in z else "f32"
        idx = cls(metric=str(z["metric"]), mesh=mesh, axis=axis, dtype=dtype)
        # rows were already normalized at save time for cosine; rebuild the
        # store from the saved store-dtype values directly (no dequantize/
        # requantize round-trip, no double normalization)
        vec = z["vectors"]
        if dtype == "int8":
            idx.store = VectorStore.from_quantized(vec, z["scales"],
                                                   mesh=mesh, axis=axis)
            return idx
        if dtype == "bf16":
            vec = vec.view(jnp.bfloat16).astype(np.float32)  # host cast
        idx.store = VectorStore.build(vec, mesh=mesh, axis=axis, dtype=dtype)
        return idx
