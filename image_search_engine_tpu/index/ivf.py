"""IVF ("cell-probe") and IVF-PQ indexes.

Replaces the reference's ``faiss.IndexIVFPQ`` construction (backend/
utils.py:311-325: IndexFlatL2 coarse quantizer, ncentroids=8, m=16
subquantizers, 8 bits, nprobe=5) with a TPU-shaped design:

  * coarse quantizer = the k-means trainer of ops/kmeans.py;
  * inverted lists stored as a *padded rectangular* layout
    (nlist, max_list) of row ids — TPU-static shapes instead of ragged
    CPU lists (SURVEY.md hard part #4);
  * IVF search: nprobe nearest centroids per query, gather the probed
    lists' rows, fused distance + top-k over the candidate block;
  * PQ variant: per-subspace 256-entry codebooks trained on coarse
    residuals (Faiss's default by-residual semantics), ADC via a one-hot
    einsum so the LUT lookups ride the MXU.

Recall-parity is tested against exact flat search (tests/test_ivf.py), the
BASELINE.json metric.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional, Tuple

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from image_search_engine_tpu.ops.kmeans import KMeans, assign_jax
from image_search_engine_tpu.ops import round_up



def _pad_results(d: np.ndarray, i: np.ndarray, k: int):
    """Pad (Q, k_eff) results out to (Q, k) with inf/-1 (faiss semantics
    when fewer than k candidates were probed)."""
    if d.shape[1] >= k:
        return d[:, :k], i[:, :k]
    pad = k - d.shape[1]
    d = np.pad(d, ((0, 0), (0, pad)), constant_values=np.inf)
    i = np.pad(i, ((0, 0), (0, pad)), constant_values=-1)
    return d, i


def _build_lists(codes: np.ndarray, nlist: int, row_offset: int = 0) -> np.ndarray:
    """Vectorized padded inverted-list construction: O(N log N) NumPy
    (stable argsort + per-cluster slicing) instead of a per-row Python
    loop. Rows get ``row_offset`` added (global ids for sharded lists)."""
    counts = np.bincount(codes, minlength=nlist)
    max_list = round_up(max(int(counts.max(initial=0)), 1), 8)
    lists = np.full((nlist, max_list), -1, np.int32)
    order = np.argsort(codes, kind="stable")
    starts = np.concatenate([[0], np.cumsum(counts)])
    for c in range(nlist):
        rows = order[starts[c] : starts[c + 1]]
        lists[c, : len(rows)] = rows + row_offset
    return lists


def _build_buckets(
    codes: np.ndarray, nlist: int, cap_factor: float = 1.3
) -> Tuple[np.ndarray, np.ndarray]:
    """Balanced padded inverted lists: cells larger than the cap are SPLIT
    into multiple fixed-width buckets that duplicate the cell's centroid.

    A single (nlist, max_over_all_cells) rectangle is TPU-static but its
    memory and probe-gather cost scale with the LARGEST cell — on skewed
    data that is unbounded (a 1M-corpus run measured max_list 6.7x the
    mean, a 3.4 GB table and an OOM probe gather). Capping the bucket
    width at ~cap_factor x mean bounds both; a probe that ranks bucket
    centroids sees a split cell's buckets at identical distance and walks
    them adjacently, so ``nprobe`` buckets ~= nprobe * cap rows scanned.

    Returns (lists (nbuckets, cap) int32 row ids with -1 padding,
    bucket_cell (nbuckets,) int32 owning-cell ids).
    """
    n = codes.shape[0]
    counts = np.bincount(codes, minlength=nlist)
    cap = round_up(max(8, int(np.ceil(cap_factor * max(n, 1) / max(nlist, 1)))), 8)
    order = np.argsort(codes, kind="stable")
    starts = np.concatenate([[0], np.cumsum(counts)])
    lists_rows, bucket_cell = [], []
    for c in range(nlist):
        rows = order[starts[c] : starts[c + 1]]
        nb = max(1, -(-len(rows) // cap))
        for b in range(nb):
            chunk = rows[b * cap : (b + 1) * cap]
            padded = np.full(cap, -1, np.int32)
            padded[: len(chunk)] = chunk
            lists_rows.append(padded)
            bucket_cell.append(c)
    return np.stack(lists_rows), np.asarray(bucket_cell, np.int32)


@functools.partial(jax.jit, static_argnames=("k", "nprobe", "max_list"))
def _ivf_search_kernel(
    q, centroids, lists, list_valid, packed, packed_norms,
    k: int, nprobe: int, max_list: int,
):
    """Batched IVF scan: probe lists -> block gather -> distance -> top-k.

    q: (Q, d); centroids: (nlist, d); lists: (nlist, max_list) int32 GLOBAL
    row ids (the result vocabulary); packed: (nlist, max_list, d) vectors
    stored list-contiguous so probing a cell is one contiguous block read
    (a flat row gather issues per-row random reads — the same pathology
    the two-phase top-k's phase 2 had); packed_norms: (nlist, max_list)
    with +inf at pad slots. Returns (dist (Q, k) ascending, ids, pad mask).
    """
    # nearest nprobe centroids per query
    cn = jnp.sum(centroids * centroids, axis=1)
    cd = cn[None, :] - 2.0 * jnp.dot(q, centroids.T, preferred_element_type=jnp.float32)
    _, probe = jax.lax.top_k(-cd, nprobe)  # (Q, nprobe)

    cand = lists[probe].reshape(q.shape[0], nprobe * max_list)  # (Q, C)
    cand_valid = list_valid[probe].reshape(q.shape[0], nprobe * max_list)
    vecs = packed[probe].reshape(q.shape[0], nprobe * max_list, -1)  # (Q, C, d)
    vn = packed_norms[probe].reshape(q.shape[0], nprobe * max_list)

    qn = jnp.sum(q * q, axis=1, keepdims=True)
    cross = jnp.einsum("qd,qcd->qc", q.astype(packed.dtype), vecs,
                       preferred_element_type=jnp.float32)
    dist = qn - 2.0 * cross + vn  # pad slots carry +inf norms
    dist = jnp.where(cand_valid, dist, jnp.inf)

    vals, pos = jax.lax.top_k(-dist, k)
    ids = jnp.take_along_axis(cand, pos, axis=1)
    ok = jnp.take_along_axis(cand_valid, pos, axis=1)
    return -vals, ids, ok


class IVFIndex:
    """Cell-probe index: coarse k-means partition + probed exact scan."""

    metric_kind = "ivf"

    def __init__(
        self,
        metric: str = "l2",
        nlist: int = 8,
        nprobe: int = 5,
        mesh: Optional[Mesh] = None,
        seed: int = 42,
        table_dtype: str = "f32",
    ):
        if metric not in ("l2", "cosine"):
            raise ValueError("IVFIndex supports l2/cosine")
        if table_dtype not in ("f32", "bf16"):
            raise ValueError("IVF table_dtype must be f32 or bf16")
        self.table_dtype = table_dtype
        self.metric = metric
        self.nlist = nlist
        self.nprobe = min(nprobe, nlist)
        self.mesh = mesh  # reserved: per-shard lists (round 2)
        self.seed = seed
        self.centroids: Optional[np.ndarray] = None  # (nlist, d) cell centroids
        self.bucket_cell: Optional[np.ndarray] = None  # (nbuckets,) cell of each bucket
        self.vectors: Optional[np.ndarray] = None
        self.lists: Optional[np.ndarray] = None
        self.list_valid: Optional[np.ndarray] = None

    @property
    def ntotal(self) -> int:
        return 0 if self.vectors is None else self.vectors.shape[0]

    def _prep(self, x: np.ndarray) -> np.ndarray:
        x = np.asarray(x, np.float32)
        if self.metric == "cosine":
            x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
        return x

    def add(self, x: np.ndarray) -> "IVFIndex":
        """Train the coarse quantizer (first add only — faiss semantics:
        ``index.train`` once, then ``index.add`` appends, utils.py:322-329)
        and (re)build the padded inverted lists. Subsequent adds assign
        new rows to the EXISTING cells and re-bucket — no retrain, so the
        coarse partition (and any saved PQ residual books) stay valid."""
        x = self._prep(x)
        first = self.vectors is None
        if not first:
            x = np.concatenate([self.vectors, x])
        self.vectors = x
        n = x.shape[0]

        if first or self.centroids is None:
            km = KMeans(n_clusters=self.nlist, niter=25, nredo=3,
                        seed=self.seed, spherical=False).fit(x)
            self.centroids = km.cluster_centers_
            codes = km.transform(x)[:, 0]
        else:
            codes = self._assign_cells(x)

        self.lists, self.bucket_cell = _build_buckets(codes, self.nlist)
        self.list_valid = self.lists >= 0
        self._pack()
        return self

    def _assign_cells(self, x) -> np.ndarray:
        codes, _ = assign_jax(jnp.asarray(x), jnp.asarray(self.centroids))
        return np.asarray(codes)

    #: bytes per streamed pack chunk (host-memory high-water knob)
    PACK_CHUNK_BYTES = 128 << 20

    def _pack(self) -> None:
        """List-contiguous vector layout: probing a bucket reads one
        contiguous (cap, d) block instead of cap random rows. Split cells'
        buckets duplicate the cell centroid so probing ranks buckets; the
        duplicates tie at the cell's distance, so a split cell's buckets
        are probed adjacently.

        The table is built by STREAMING bucket blocks into a preallocated
        array (faiss's ``add`` is likewise incremental, reference
        utils.py:322-329): build-time host high-water is corpus + final
        table + one ~128 MB chunk. The old whole-array fancy-index built
        up to two extra full-size temporaries (an f32 gather result, then
        an astype copy for bf16 tables, then ANOTHER f32 copy for norms) —
        ~3.9x N*d*4 peak for a bf16 table vs ~1.65x streamed."""
        import ml_dtypes

        nb, cap = self.lists.shape
        d = self.vectors.shape[1]
        dt = np.float32 if self.table_dtype == "f32" else ml_dtypes.bfloat16
        self.packed = np.zeros((nb, cap, d), dt)
        self.packed_norms = np.full((nb, cap), np.inf, np.float32)
        chunk = max(1, self.PACK_CHUNK_BYTES // max(cap * d * 4, 1))
        for s in range(0, nb, chunk):
            lst = self.lists[s : s + chunk]
            blk = self.vectors[np.maximum(lst, 0)]
            blk[lst < 0] = 0.0
            self.packed[s : s + chunk] = blk  # casts on assignment (bf16)
            # norms from the ROUNDED stored values so the probed scan
            # stays exact over the table it actually scans
            blk32 = self.packed[s : s + chunk].astype(np.float32)
            self.packed_norms[s : s + chunk] = np.where(
                lst >= 0, (blk32 * blk32).sum(axis=2), np.inf)
        self.bucket_centroids = self.centroids[self.bucket_cell]
        self._dev = None  # invalidate cached device arrays

    def _effective_nprobe(self) -> int:
        """Buckets to probe so the expected scanned-row count matches the
        user's cell-denominated nprobe (cells split into b buckets need b
        probe slots to cover)."""
        nb = self.lists.shape[0]
        scaled = -(-self.nprobe * nb // self.nlist)
        return int(min(nb, max(self.nprobe, scaled)))

    def _device_arrays(self):
        """Device-resident search state, uploaded once (a per-call
        jnp.asarray would re-transfer the packed table on every query)."""
        if getattr(self, "_dev", None) is None:
            self._dev = (
                jnp.asarray(self.bucket_centroids), jnp.asarray(self.lists),
                jnp.asarray(self.list_valid), jnp.asarray(self.packed),
                jnp.asarray(self.packed_norms),
            )
        return self._dev

    def search(self, q: np.ndarray, k: int) -> Tuple[np.ndarray, np.ndarray]:
        assert self.vectors is not None, "add() first"
        q = self._prep(np.atleast_2d(np.asarray(q, np.float32)))
        # probed candidate pool can be smaller than k
        nprobe = self._effective_nprobe()
        k_eff = min(k, self.ntotal, nprobe * self.lists.shape[1])
        bcents, lists, valid, packed, pnorms = self._device_arrays()
        out = _ivf_search_kernel(
            jnp.asarray(q), bcents, lists, valid, packed, pnorms,
            k_eff, nprobe, self.lists.shape[1],
        )
        d, i, ok = (np.array(a) for a in jax.device_get(out))  # one RTT
        i[~ok] = -1  # faiss returns -1 when probes hold < k candidates
        return self._finish(d, i, k)

    def search_batched(self, q: np.ndarray, k: int) -> Tuple[np.ndarray, np.ndarray]:
        """Batched probed search through the fused Pallas scan
        (ops/ivf_pallas.py): no (Q, nprobe*cap, d) gather buffer, so real
        query batches fit where the XLA path OOMed (VERDICT r1 weak #3 —
        batched IVF measured "100x slower per call" from that gather).
        Results match ``search`` exactly (same probes, same scan set).
        """
        assert self.vectors is not None, "add() first"
        from image_search_engine_tpu.ops.ivf_pallas import ivf_probed_topk

        q = self._prep(np.atleast_2d(np.asarray(q, np.float32)))
        nprobe = self._effective_nprobe()
        k_eff = min(k, self.ntotal, nprobe * self.lists.shape[1])
        bcents, lists, _, packed, pnorms = self._device_arrays()
        out = ivf_probed_topk(
            jnp.asarray(q), bcents, packed, pnorms, lists, k_eff, nprobe,
        )
        d, i, ok = (np.array(a) for a in jax.device_get(out))  # one RTT
        i[~ok] = -1
        return self._finish(d, i, k)

    def _finish(self, d: np.ndarray, i: np.ndarray, k: int):
        d, i = _pad_results(d, i, k)
        if self.metric == "cosine":
            # rows were L2-normalized, so L2^2 = 2 - 2*cos: convert to the
            # descending similarity FlatIndex("cosine") returns (one metric
            # name, one semantics across index types)
            d = np.where(i >= 0, 1.0 - d / 2.0, -np.inf)
        return d, i

    def row_cells(self) -> np.ndarray:
        """Per-row coarse-cell assignment (N,), reconstructed from the
        inverted lists — lets a saved artifact reshard (ShardedIVFPQ)
        without re-running the coarse quantizer or needing raw vectors."""
        n = self.ntotal
        rc = np.full(n, -1, np.int32)
        valid = self.lists >= 0
        owner = np.repeat(self.bucket_cell, self.lists.shape[1]).reshape(
            self.lists.shape
        )
        rc[self.lists[valid]] = owner[valid]
        return rc

    def save(self, path: str | Path) -> None:
        np.savez_compressed(
            path, vectors=self.vectors, centroids=self.centroids,
            lists=self.lists, bucket_cell=self.bucket_cell,
            metric=np.array(self.metric),
            nprobe=np.int64(self.nprobe), kind=np.array(self.metric_kind),
            table_dtype=np.array(self.table_dtype),
        )

    @classmethod
    def load(cls, path: str | Path, mesh: Optional[Mesh] = None) -> "IVFIndex":
        z = np.load(path, allow_pickle=False)
        self = cls(metric=str(z["metric"]), nlist=z["centroids"].shape[0],
                   nprobe=int(z["nprobe"]), mesh=mesh,
                   table_dtype=str(z["table_dtype"]) if "table_dtype" in z else "f32")
        self.vectors = z["vectors"]
        self.centroids = z["centroids"]
        self.lists = z["lists"]
        self.bucket_cell = z["bucket_cell"]
        self.list_valid = self.lists >= 0
        self._pack()
        return self


def _adc_probe_distances(q, cent, pq_books, m: int, ccodes, valid):
    """One probed cell's ADC distances (traceable, shared by the
    single-chip ``_ivfpq_search_kernel`` and the mesh
    ``ShardedIVFPQ.search`` shard program): residual LUT + per-subspace
    bf16 one-hot einsum so the lookup rides the MXU — measured 13x
    faster than TPU gathers at the 1M operating point (see
    ``_ivfpq_search_kernel``). Memory stays bounded at one
    (Q, L, 256) bf16 transient per subspace step.

    q (Q, d); cent (Q, d) the probed cell's centroid per query;
    ccodes (Q, L, m) uint8; valid (Q, L) bool. Returns (Q, L) f32
    distances, +inf at invalid slots."""
    qn_, d = q.shape
    dsub = d // m
    resid = (q - cent).reshape(qn_, m, dsub)  # (Q, m, dsub)
    # LUT[q, m, 256] = ||resid - book||^2
    lut = (
        jnp.sum(resid * resid, axis=2)[:, :, None]
        - 2.0 * jnp.einsum("qmd,mkd->qmk", resid, pq_books,
                           preferred_element_type=jnp.float32)
        + jnp.sum(pq_books * pq_books, axis=2)[None]
    )  # (Q, m, 256)
    # dist[q, l] = sum_m lut[q, m, ccodes[q, l, m]], one subspace at a
    # time so the one-hot transient stays (Q, L, 256) bf16
    dist = jnp.zeros(ccodes.shape[:2], jnp.float32)
    for mm in range(m):
        oh = jax.nn.one_hot(ccodes[:, :, mm].astype(jnp.int32), 256,
                            dtype=jnp.bfloat16)
        dist = dist + jnp.einsum(
            "qlk,qk->ql", oh, lut[:, mm].astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
    return jnp.where(valid, dist, jnp.inf)


@functools.partial(
    jax.jit, static_argnames=("k", "nprobe", "max_list", "m", "rerank")
)
def _ivfpq_search_kernel(
    q, centroids, lists, list_valid, packed_codes, pq_books,
    k: int, nprobe: int, max_list: int, m: int,
    rerank: int = 0, packed_raw=None, packed_norms=None,
):
    """ADC scan: LUT of query-residual-to-codeword distances, summed per
    candidate via per-subspace one-hot einsums in bfloat16 — the lookup
    rides the MXU with memory bounded at one (Q, max_list, 256) bf16
    transient per subspace step. Measured on chip vs the alternatives at
    the 1M operating point (Q=256, L=1272, m=16, per probe): 4-D
    take_along_axis 69 ms, 2-D flat gather 56 ms, this form 5.2 ms (TPU
    gathers are the pathology; matmuls are not). bf16 LUT rounding adds
    ~1e-3 relative distance error — far below PQ quantization noise.
    (Round 1's single one-hot einsum materialized (Q, L, m, 256) f32 at
    once and OOMed any real batch.)

    packed_codes: (nlist, max_list, m) uint8 stored list-contiguous (one
    block read per probed cell — a byte per subspace, so the device table
    really is ~N*m bytes); pq_books: (m, 256, dsub). Codes widen to int32
    only at the (Q, L) one-hot slice.
    """
    qn_, d = q.shape
    cn = jnp.sum(centroids * centroids, axis=1)
    cd = cn[None, :] - 2.0 * jnp.dot(q, centroids.T, preferred_element_type=jnp.float32)
    _, probe = jax.lax.top_k(-cd, nprobe)  # (Q, nprobe)

    # scan probes one at a time: residuals differ per coarse cell
    def per_probe(p):
        cand = lists[probe[:, p]]  # (Q, max_list)
        valid = list_valid[probe[:, p]]
        dist = _adc_probe_distances(
            q, centroids[probe[:, p]], pq_books, m,
            packed_codes[probe[:, p]], valid)
        return dist, cand, valid

    dists, cands, valids = [], [], []
    for p in range(nprobe):
        dd, cc, vv = per_probe(p)
        dists.append(dd)
        cands.append(cc)
        valids.append(vv)
    dist = jnp.concatenate(dists, axis=1)
    cand = jnp.concatenate(cands, axis=1)
    valid = jnp.concatenate(valids, axis=1)

    if rerank:
        # Refine stage (the faiss IndexRefineFlat composition): ADC ranks
        # a top-``rerank`` shortlist, then the true distances are computed
        # from the raw packed table and the final top-k is exact over the
        # store. PQ noise then only has to keep true neighbors inside the
        # shortlist, not rank them — which is what it is actually good at.
        _, pos = jax.lax.top_k(-dist, rerank)  # (Q, C)
        cell = jnp.take_along_axis(probe, pos // max_list, axis=1)  # (Q, C)
        slot = pos % max_list
        rows = packed_raw[cell, slot]  # (Q, C, d) row gather
        rn = packed_norms[cell, slot]  # +inf at pad slots
        qn = jnp.sum(q * q, axis=1, keepdims=True)
        cross = jnp.einsum("qd,qcd->qc", q.astype(rows.dtype), rows,
                           preferred_element_type=jnp.float32)
        dist = qn - 2.0 * cross + rn
        cand = jnp.take_along_axis(cand, pos, axis=1)
        valid = jnp.take_along_axis(valid, pos, axis=1)
        dist = jnp.where(valid, dist, jnp.inf)

    vals, pos = jax.lax.top_k(-dist, k)
    ids = jnp.take_along_axis(cand, pos, axis=1)
    ok = jnp.take_along_axis(valid, pos, axis=1)
    return -vals, ids, ok


@functools.partial(jax.jit, static_argnames=("m", "chunk"))
def _pq_reconstruct_table(packed_codes, pq_books, bucket_centroids,
                          list_valid, m: int, chunk: int = 128):
    """Decompress list-contiguous PQ codes into a bf16 (nbuckets, cap, d)
    reconstruction table: recon[b, l] = cell_centroid[b] + concat_m
    books[m, codes[b, l, m]]. Because the subspaces are an orthogonal
    decomposition, squared-L2 to the reconstruction IS the ADC distance
    (sum of per-subspace LUT entries) — so scanning this table gives PQ
    semantics at raw-IVF scan speed.

    The codeword lookup is a one-hot MXU matmul per subspace (TPU gathers
    are the pathology — see _ivfpq_search_kernel's measurements), chunked
    over buckets with lax.map so the one-hot transient stays
    (chunk*cap, 256) bf16. Output is bf16: the table is a transient
    (rebuilt per batched dispatch); the artifact still stores only codes.

    Operating point (1M/m=16, /tmp-microbench logged in BENCH_NOTES):
    chunk=128 -> 27.9 ms vs 83 ms at chunk=32 (lax.map per-step overhead)
    and ~185 ms for a block-diagonal (n, m*256)x(m*256, d) single-matmul
    variant (negative result: the combined one-hot transient doesn't fuse
    and the 16x FLOP inflation isn't free).
    """
    nb, cap, _ = packed_codes.shape
    k256, dsub = pq_books.shape[1], pq_books.shape[2]
    books_bf = pq_books.astype(jnp.bfloat16)
    nbp = round_up(nb, chunk)
    codes = jnp.pad(packed_codes, ((0, nbp - nb), (0, 0), (0, 0)))

    def do_chunk(codes_c):  # (chunk, cap, m) uint8
        flat = codes_c.reshape(chunk * cap, m)
        parts = []
        for mm in range(m):
            oh = jax.nn.one_hot(flat[:, mm].astype(jnp.int32), k256,
                                dtype=jnp.bfloat16)
            parts.append(jnp.dot(oh, books_bf[mm],
                                 preferred_element_type=jnp.float32))
        return jnp.concatenate(parts, axis=1).reshape(chunk, cap, m * dsub)

    recon = jax.lax.map(do_chunk, codes.reshape(nbp // chunk, chunk, cap, m))
    recon = recon.reshape(nbp, cap, m * dsub)[:nb]
    recon = (recon + bucket_centroids[:, None, :]).astype(jnp.bfloat16)
    norms = jnp.sum(jnp.square(recon.astype(jnp.float32)), axis=-1)
    norms = jnp.where(list_valid, norms, jnp.inf)
    return recon, norms


@functools.partial(jax.jit, static_argnames=("k",))
def _exact_rescore(q, vectors, ids, ok, k: int):
    """Refine a candidate shortlist against the raw (N, d) store: exact
    distances, final top-k. Runs as a second device program after the
    probed scan (no host round-trip in between)."""
    rows = vectors[jnp.maximum(ids, 0)]  # (Q, C, d)
    qn = jnp.sum(q * q, axis=1, keepdims=True)
    cross = jnp.einsum("qd,qcd->qc", q, rows,
                       preferred_element_type=jnp.float32)
    rn = jnp.sum(rows * rows, axis=-1)
    dist = jnp.where(ok, qn - 2.0 * cross + rn, jnp.inf)
    vals, pos = jax.lax.top_k(-dist, k)
    return (-vals, jnp.take_along_axis(ids, pos, axis=1),
            jnp.take_along_axis(ok, pos, axis=1))


class IVFPQIndex(IVFIndex):
    """IVF + product quantization (the reference's actual "cell-probe"
    index, utils.py:311-325): m sub-quantizers x 8 bits, residual-encoded.
    Compressed storage: N*m bytes instead of N*d*4."""

    metric_kind = "ivfpq"

    def __init__(self, metric: str = "l2", nlist: int = 8, nprobe: int = 5,
                 m: int = 16, mesh: Optional[Mesh] = None, seed: int = 42,
                 rerank: int = 0, recon_cache: bool = False):
        super().__init__(metric=metric, nlist=nlist, nprobe=nprobe, mesh=mesh, seed=seed)
        self.m = m
        # default exact-rerank shortlist size (0 = ADC ranking only);
        # rerank needs the raw vectors (add() keeps them; codes-only
        # artifacts cannot rerank — save(store_raw=True) to preserve)
        self.rerank = rerank
        # serving-throughput mode: keep the bf16 reconstruction table
        # resident between search_batched dispatches (N*d*2 bytes HBM)
        # instead of decompressing per dispatch (~83 ms at 1M/m=16) —
        # the artifact on disk stays codes-only either way
        self.recon_cache = recon_cache
        self.pq_books: Optional[np.ndarray] = None  # (m, 256, dsub)
        self.codes: Optional[np.ndarray] = None  # (N, m) uint8
        self._ntotal: Optional[int] = None  # set when loaded without raw vectors

    @property
    def ntotal(self) -> int:
        if self.vectors is not None:
            return self.vectors.shape[0]
        if self._ntotal is not None:
            return self._ntotal
        return 0 if self.codes is None else self.codes.shape[0]

    def add(self, x: np.ndarray) -> "IVFPQIndex":
        super().add(x)  # coarse quantizer + lists (keeps raw vectors for recall tests)
        x = self.vectors
        n, d = x.shape
        if d % self.m:
            raise ValueError(f"dim {d} not divisible by m={self.m}")
        dsub = d // self.m
        cell = self.centroids[self._assign_cells(x)]
        resid = (x - cell).reshape(n, self.m, dsub)
        # all m codebooks train in ONE vmapped chunked-Lloyd program
        # (ops/kmeans.subspace_kmeans) — m serial KMeans.fit calls paid m
        # host round-trips per iteration (~25 min at 1M x 128 / m=16)
        ksub = min(256, max(2, n))
        from image_search_engine_tpu.ops.kmeans import subspace_kmeans

        books_j, codes_j = subspace_kmeans(
            jnp.asarray(resid), k=ksub, niter=20, seed=self.seed)
        books = np.zeros((self.m, 256, dsub), np.float32)
        books[:, :ksub] = np.asarray(books_j)
        self.pq_books = books
        self.codes = np.asarray(codes_j).astype(np.uint8)
        self._pack_codes()
        return self

    def _pack_codes(self) -> None:
        """List-contiguous code layout, mirroring IVFIndex._pack (and its
        streamed build — no whole-table gather temporary). Stays uint8 on
        device — a byte per subspace is PQ's whole point; the ADC kernels
        widen per (Q, L) slice at the one-hot site."""
        nb, cap = self.lists.shape
        self.packed_codes = np.zeros((nb, cap, self.m), np.uint8)
        chunk = max(1, self.PACK_CHUNK_BYTES // max(cap * self.m, 1))
        for s in range(0, nb, chunk):
            lst = self.lists[s : s + chunk]
            blk = self.codes[np.maximum(lst, 0)]
            blk[lst < 0] = 0
            self.packed_codes[s : s + chunk] = blk
        self._dev_pq = None
        self._dev_raw = None
        self._recon_tab = None

    def _device_arrays_pq(self):
        if getattr(self, "_dev_pq", None) is None:
            self._dev_pq = (
                jnp.asarray(self.bucket_centroids), jnp.asarray(self.lists),
                jnp.asarray(self.list_valid), jnp.asarray(self.packed_codes),
                jnp.asarray(self.pq_books),
            )
        return self._dev_pq

    def search_batched(self, q: np.ndarray, k: int,
                       rerank: Optional[int] = None) -> Tuple[np.ndarray, np.ndarray]:
        """Batch-throughput PQ search: decompress the codes into a bf16
        reconstruction table on device (_pq_reconstruct_table — ADC
        semantics exactly, see its docstring), then the fused probed-scan
        Pallas kernel (ops/ivf_pallas) scores it like a raw IVF table.
        Results match ``search`` up to bf16 rounding of the
        reconstruction; the table is a per-dispatch transient, so resting
        memory stays codes-only. With ``rerank`` the shortlist is then
        re-scored exactly from the raw vectors (same dispatch chain, no
        intermediate readback)."""
        assert self.codes is not None, "add() first"
        from image_search_engine_tpu.ops.ivf_pallas import ivf_probed_topk

        rerank = self.rerank if rerank is None else rerank
        q = self._prep(np.atleast_2d(np.asarray(q, np.float32)))
        nprobe = self._effective_nprobe()
        pool = nprobe * self.lists.shape[1]
        k_eff = min(k, self.ntotal, pool)
        bcents, lists, valid, pcodes, books = self._device_arrays_pq()
        if self.recon_cache and getattr(self, "_recon_tab", None) is not None:
            recon, norms = self._recon_tab
        else:
            recon, norms = _pq_reconstruct_table(pcodes, books, bcents, valid,
                                                 self.m)
            if self.recon_cache:
                self._recon_tab = (recon, norms)
        if rerank:
            if self.vectors is None:
                raise ValueError(
                    "rerank needs raw vectors; this index holds codes only "
                    "(rebuild or save(store_raw=True))"
                )
            c_eff = min(max(rerank, k_eff), pool)
            qd = jnp.asarray(q)
            out = ivf_probed_topk(qd, bcents, recon, norms, lists, c_eff, nprobe)
            out = _exact_rescore(qd, self._device_raw(), out[1], out[2], k_eff)
        else:
            out = ivf_probed_topk(jnp.asarray(q), bcents, recon, norms, lists,
                                  k_eff, nprobe)
        d, i, ok = (np.array(a) for a in jax.device_get(out))  # one RTT
        i[~ok] = -1
        return self._finish(d, i, k)

    def _device_raw(self):
        """Raw (N, d) f32 store on device, cached (rerank's rescore target)."""
        if getattr(self, "_dev_raw", None) is None:
            self._dev_raw = jnp.asarray(self.vectors)
        return self._dev_raw

    def search(self, q: np.ndarray, k: int,
               rerank: Optional[int] = None) -> Tuple[np.ndarray, np.ndarray]:
        """ADC scan; with ``rerank=C`` (or the constructor default) the
        top-C ADC shortlist is re-scored EXACTLY from the raw vectors in
        the same dispatch, so returned distances/ranks are exact over the
        store (faiss's IndexRefineFlat composition over the reference's
        cell-probe index, utils.py:311-325)."""
        assert self.codes is not None, "add() first"
        rerank = self.rerank if rerank is None else rerank
        q = self._prep(np.atleast_2d(np.asarray(q, np.float32)))
        nprobe = self._effective_nprobe()
        pool = nprobe * self.lists.shape[1]
        k_eff = min(k, self.ntotal, pool)
        bcents, lists, valid, pcodes, books = self._device_arrays_pq()
        raw = norms = None
        c_eff = 0
        if rerank:
            if self.vectors is None:
                raise ValueError(
                    "rerank needs raw vectors; this index holds codes only "
                    "(rebuild or save(store_raw=True))"
                )
            c_eff = min(max(rerank, k_eff), pool)
            _, _, _, raw, norms = self._device_arrays()
        out = _ivfpq_search_kernel(
            jnp.asarray(q), bcents, lists, valid, pcodes, books,
            k_eff, nprobe, self.lists.shape[1], self.m,
            rerank=c_eff, packed_raw=raw, packed_norms=norms,
        )
        d, i, ok = (np.array(a) for a in jax.device_get(out))  # one RTT
        i[~ok] = -1
        return self._finish(d, i, k)

    def save(self, path: str | Path, store_raw: bool = False) -> None:
        # PQ is the compressed index: raw vectors are NOT saved by default
        # (search needs only centroids/lists/codes/books, N*m bytes - the
        # class's stated memory win); store_raw=True keeps them for recall
        # evaluation.
        payload = dict(
            centroids=self.centroids, lists=self.lists, bucket_cell=self.bucket_cell,
            metric=np.array(self.metric), nprobe=np.int64(self.nprobe),
            kind=np.array(self.metric_kind), pq_books=self.pq_books, codes=self.codes,
            ntotal=np.int64(self.ntotal), rerank=np.int64(self.rerank),
        )
        if store_raw:
            payload["vectors"] = self.vectors
        np.savez_compressed(path, **payload)

    @classmethod
    def load(cls, path: str | Path, mesh: Optional[Mesh] = None) -> "IVFPQIndex":
        z = np.load(path, allow_pickle=False)
        self = cls(metric=str(z["metric"]), nlist=z["centroids"].shape[0],
                   nprobe=int(z["nprobe"]), m=z["codes"].shape[1], mesh=mesh,
                   rerank=int(z["rerank"]) if "rerank" in z.files else 0)
        self.vectors = z["vectors"] if "vectors" in z.files else None
        self._ntotal = int(z["ntotal"]) if "ntotal" in z.files else None
        self.centroids = z["centroids"]
        self.lists = z["lists"]
        self.bucket_cell = z["bucket_cell"]
        self.list_valid = self.lists >= 0
        self.pq_books = z["pq_books"]
        self.codes = z["codes"]
        self.bucket_centroids = self.centroids[self.bucket_cell]
        self._pack_codes()
        if self.vectors is not None:
            self._pack()
        return self
