"""ICI-sharded IVF and IVF-PQ search.

Scales the cell-probe index across the mesh (BASELINE.json config #4/5 at
multi-chip corpora): rows are block-sharded as in the flat store, each
device keeps the *same* coarse centroids (trained globally, optionally via
parallel/kmeans.py) but balanced probe buckets over its own rows only
(cells above the width cap split into buckets that duplicate the cell
centroid — see index/ivf._build_buckets). A query ranks its shard's
buckets, scans the nprobe best locally, and the per-shard
(k, dist, global-id) results merge over ICI exactly like the flat path.
Because bucketization is per-shard, results can differ from the unsharded
index near the probe frontier; recall parity is what's tested.

``ShardedIVFPQ`` is the PQ-preserving variant (the reference's actual
"cell-probe" index, backend/utils.py:311-325, composed with the BASELINE
ICI mandate): each shard holds only its rows' PACKED PQ CODES
((nbuckets, cap, m) bytes-per-row storage, the compression that is PQ's
whole point) plus the replicated codebooks; the ADC scan and the top-k
merge run inside one shard_map. Resharding needs no raw vectors — a
codes-only IVFPQ artifact scales out as-is.
"""

from __future__ import annotations

import logging
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from image_search_engine_tpu.ops import round_up

_log = logging.getLogger(__name__)



class ShardedIVF:
    """Device-resident sharded IVF built from host arrays.

    Build with ``from_components`` (vectors + global centroids); search is
    one shard_map program. Each shard holds its rows in the same
    list-contiguous PACKED layout as the single-chip ``IVFIndex`` — (nb,
    cap, d) bucket blocks + (nb, cap) pad-poisoned norms — so the
    shard-local scan runs the fused probed-scan kernel
    (ops/ivf_pallas.ivf_probed_topk): every grid step DMAs the probed
    bucket blocks straight into VMEM instead of materializing the
    (Q, nprobe*cap, d) XLA gather buffer that made batched IVF "100x
    slower" single-chip (round-2 fix, BENCH_NOTES "Batched IVF via the
    fused probed-scan kernel": 118.7k QPS at 1M/Q=1024 — the per-shard
    cost model, at 1/S the rows per shard).
    """

    def __init__(self, mesh: Mesh, axis: str = "data", metric: str = "l2"):
        if metric not in ("l2", "cosine"):
            raise ValueError("ShardedIVF supports l2/cosine")
        self.mesh = mesh
        self.axis = axis
        self.metric = metric
        self.centroids = None  # (nlist, d) replicated cell centroids
        self.bucket_centroids = None  # (S*nb, d) sharded; pads poisoned far
        self.packed = None  # (S*nb, cap, d) list-contiguous rows, sharded
        self.packed_norms = None  # (S*nb, cap) f32, +inf at pad slots
        self.lists = None  # (S*nb, cap) sharded on first axis
        self.n = 0
        self.rows_per_shard = 0
        self.nlist = 0
        self.nbuckets = 0
        self.nprobe = 0

    def _prep_query(self, q: np.ndarray) -> np.ndarray:
        q = np.atleast_2d(np.asarray(q, np.float32))
        if self.metric == "cosine":
            q = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
        return q

    def _finish(self, d: np.ndarray, i: np.ndarray, k: int):
        """Match the unsharded classes' result semantics (index/ivf.py
        _finish): -1 ids at under-full probes, cosine converted from the
        L2-over-normalized-rows scan to descending similarity."""
        i[~np.isfinite(d)] = -1
        if d.shape[1] < k:
            d = np.pad(d, ((0, 0), (0, k - d.shape[1])), constant_values=np.inf)
            i = np.pad(i, ((0, 0), (0, k - i.shape[1])), constant_values=-1)
        d, i = d[:, :k], i[:, :k]
        if self.metric == "cosine":
            d = np.where(i >= 0, 1.0 - d / 2.0, -np.inf)
        return d, i

    @classmethod
    def from_components(
        cls,
        x: np.ndarray,
        centroids: np.ndarray,
        nprobe: int,
        mesh: Mesh,
        axis: str = "data",
        metric: str = "l2",
        table_dtype: str = "f32",
    ) -> "ShardedIVF":
        """``table_dtype="bf16"`` halves each shard's row storage (the
        same knob as the single-chip ``IVFIndex(table_dtype=...)``, whose
        bf16 table also measured 2.1x faster on the HBM-bound probed
        scan); scoring stays exact over the stored (rounded) values."""
        import ml_dtypes

        from image_search_engine_tpu.ops.kmeans import assign_jax

        if table_dtype not in ("f32", "bf16"):
            raise ValueError("table_dtype must be f32 or bf16")
        self = cls(mesh, axis, metric)
        x = np.asarray(x, np.float32)
        if metric == "cosine":
            # idempotent when the unsharded index already normalized rows
            x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
        n, d = x.shape
        nlist = centroids.shape[0]
        s = mesh.shape[axis]
        r = round_up(-(-n // s), 8)  # rows per shard
        codes = np.asarray(assign_jax(jnp.asarray(x), jnp.asarray(centroids))[0])

        # per-shard balanced buckets over local rows (global row ids):
        # over-full cells split into fixed-cap buckets that duplicate the
        # cell centroid (see index/ivf._build_buckets — the single padded
        # rectangle is unbounded on skewed data)
        from image_search_engine_tpu.index.ivf import _build_buckets, IVFIndex

        per_shard = []
        for si in range(s):
            lo, hi = si * r, min((si + 1) * r, n)
            if lo >= n:
                # more devices than row blocks: keep shapes uniform with
                # one all-pad bucket
                lst = np.full((1, 8), -1, np.int32)
                b_cell = np.zeros(1, np.int32)
            else:
                lst, b_cell = _build_buckets(codes[lo:hi], nlist)
            per_shard.append((lo, lst, b_cell))
        cap = max(l.shape[1] for _, l, _ in per_shard)
        nb = max(l.shape[0] for _, l, _ in per_shard)
        dt = np.float32 if table_dtype == "f32" else ml_dtypes.bfloat16
        chunk = max(1, IVFIndex.PACK_CHUNK_BYTES // max(cap * d * 4, 1))
        lists = np.full((s, nb, cap), -1, np.int32)
        # pad-bucket centroids poisoned far away so they rank last
        bcents = np.full((s, nb, d), 1e15, np.float32)
        # norms from the ROUNDED stored values (cast through the table
        # dtype) so the probed scan stays exact over the table it scans —
        # derived per chunk, never via a full-size f32 table copy
        pnorms = np.full((s, nb, cap), np.inf, np.float32)
        for si, (lo, l, b_cell) in enumerate(per_shard):
            lists[si, : l.shape[0], : l.shape[1]] = np.where(l >= 0, l + lo, -1)
            bcents[si, : l.shape[0]] = centroids[b_cell]
            if lo >= n:  # empty shard: all-pad bucket, nothing to pack
                continue
            for b0 in range(0, l.shape[0], chunk):
                ls = l[b0 : b0 + chunk]
                rows = x[lo + np.maximum(ls, 0)]
                if dt is not np.float32:
                    rows = rows.astype(dt).astype(np.float32)
                pnorms[si, b0 : b0 + ls.shape[0], : ls.shape[1]] = np.where(
                    ls >= 0, (rows * rows).sum(axis=2), np.inf)

        def _packed_block(index):
            """Host block for one shard's slice of the (S*nb, cap, d)
            packed table, streamed straight onto its device — the full
            table NEVER exists on host (the round-3 streamed-pack bound,
            index/ivf._pack, carried to the mesh build: host high-water
            is corpus + one shard block + one ~128 MB gather chunk)."""
            g0 = index[0].start or 0
            g1 = index[0].stop if index[0].stop is not None else s * nb
            blk = np.zeros((g1 - g0, cap, d), dt)
            for si in range(s):
                lo, l, _ = per_shard[si]
                if lo >= n:
                    continue
                # intersection of [g0, g1) with this shard's bucket range
                a = max(g0, si * nb)
                b = min(g1, si * nb + l.shape[0])
                for b0 in range(a, b, chunk):
                    ls = l[b0 - si * nb : min(b0 + chunk, b) - si * nb]
                    rows = x[lo + np.maximum(ls, 0)]
                    rows[ls < 0] = 0.0
                    blk[b0 - g0 : b0 - g0 + ls.shape[0], : ls.shape[1]] = rows
            return blk

        self.centroids = jax.device_put(jnp.asarray(centroids, jnp.float32),
                                        NamedSharding(mesh, P()))
        self.packed = jax.make_array_from_callback(
            (s * nb, cap, d), NamedSharding(mesh, P(axis, None, None)),
            _packed_block,
        )
        self.packed_norms = jax.device_put(
            jnp.asarray(pnorms.reshape(s * nb, cap)),
            NamedSharding(mesh, P(axis, None)),
        )
        self.lists = jax.device_put(
            jnp.asarray(lists.reshape(s * nb, cap)),
            NamedSharding(mesh, P(axis, None)),
        )
        self.bucket_centroids = jax.device_put(
            jnp.asarray(bcents.reshape(s * nb, d)),
            NamedSharding(mesh, P(axis, None)),
        )
        self.n = n
        self.rows_per_shard = r
        self.nlist = nlist
        self.nbuckets = nb
        # nprobe is cell-denominated; split cells consume one probe slot per
        # bucket, so scale by the bucket/cell ratio (duplicated centroids
        # tie, keeping a split cell's buckets adjacent in the probe order)
        self.nprobe = int(min(nb, max(nprobe, -(-nprobe * nb // nlist))))
        return self

    def search(self, q: np.ndarray, k: int,
               impl: str = "pallas") -> Tuple[np.ndarray, np.ndarray]:
        """``impl="pallas"`` (default) runs the fused probed-scan kernel
        per shard — no (Q, nprobe*cap, d) gather buffer, the round-2
        single-chip fix carried onto the mesh. ``impl="xla"`` keeps the
        gather-based reference scan for parity tests (it is the memory-
        bound formulation; do not serve with it at real Q)."""
        if impl not in ("pallas", "xla"):
            raise ValueError("impl must be pallas or xla")
        q = jnp.asarray(self._prep_query(q))
        nprobe = self.nprobe
        k_eff = min(k, max(1, min(
            self.n, self.mesh.shape[self.axis] * nprobe * self.lists.shape[1])))
        d, i = jax.device_get(sharded_ivf_scan(
            q, self.bucket_centroids, self.packed, self.packed_norms,
            self.lists, mesh=self.mesh, axis=self.axis, nprobe=nprobe,
            k_eff=k_eff, impl=impl,
        ))
        return self._finish(np.array(d), np.array(i), k)


def sharded_ivf_scan(q, bcents, packed, pnorms, lists, *, mesh: Mesh,
                     axis: str, nprobe: int, k_eff: int,
                     impl: str = "pallas"):
    """Traceable sharded probed scan + ICI merge.

    q (Q, d) replicated; bcents/packed/pnorms/lists sharded as laid out
    by ``ShardedIVF.from_components``. Returns (dist (Q, k_eff), ids)
    replicated device arrays, invalid slots (+inf, -1). shard_map
    composes under jit, so callers can fuse upstream compute into the
    same program — the engine fuses the CNN embed in front of this
    (single host transfer per sharded query)."""
    max_l = lists.shape[1]
    kk = min(k_eff, nprobe * max_l)

    def shard_fn(qr, bcents_l, packed_local, pnorms_local, lists_local):
        if impl == "pallas":
            from image_search_engine_tpu.ops.ivf_pallas import ivf_probed_topk

            dloc, ids, ok = ivf_probed_topk(
                qr, bcents_l, packed_local, pnorms_local, lists_local,
                kk, nprobe,
            )
            dist = jnp.where(ok, dloc, jnp.inf)
            ids = jnp.where(ok, ids, -1)
        else:
            # reference XLA scan over the same packed layout — gathers
            # the full (Q, nprobe, cap, d) candidate buffer
            cn = jnp.sum(bcents_l * bcents_l, axis=1)
            cd = cn[None, :] - 2.0 * jnp.dot(
                qr, bcents_l.T, preferred_element_type=jnp.float32)
            _, probe = jax.lax.top_k(-cd, nprobe)  # (Q, nprobe)
            cand = lists_local[probe].reshape(qr.shape[0], nprobe * max_l)
            vecs = packed_local[probe].reshape(
                qr.shape[0], nprobe * max_l, -1).astype(jnp.float32)
            vn = pnorms_local[probe].reshape(qr.shape[0], nprobe * max_l)
            qn = jnp.sum(qr * qr, axis=1, keepdims=True)
            cross = jnp.einsum("qd,qcd->qc", qr, vecs,
                               preferred_element_type=jnp.float32)
            # pad slots carry +inf norms -> +inf distance
            dscan = jnp.maximum(qn - 2.0 * cross + vn, 0.0)
            dscan = jnp.where(cand >= 0, dscan, jnp.inf)
            vals, pos = jax.lax.top_k(-dscan, kk)
            dist = -vals
            ids = jnp.take_along_axis(cand, pos, axis=1)

        # merge across shards
        d_all = jax.lax.all_gather(dist, axis)  # (S, Q, kk) distances
        i_all = jax.lax.all_gather(ids, axis)
        d_cat = jnp.swapaxes(d_all, 0, 1).reshape(qr.shape[0], -1)
        i_cat = jnp.swapaxes(i_all, 0, 1).reshape(qr.shape[0], -1)
        mvals, mpos = jax.lax.top_k(-d_cat, k_eff)
        mids = jnp.take_along_axis(i_cat, mpos, axis=1)
        return -mvals, mids

    f = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), P(axis, None), P(axis, None, None),
                  P(axis, None), P(axis, None)),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return f(q, bcents, packed, pnorms, lists)


def sharded_pq_recon_scan(q, bcents, lists, pcodes, books, *, mesh: Mesh,
                          axis: str, nprobe: int, m: int,
                          rows_per_shard: int, k_eff: int, c_eff: int = 0,
                          raw_rows=None, raw_norms=None,
                          recon=None, rnorms=None):
    """Traceable sharded PQ search: per-shard bf16 reconstruction table
    scanned by the fused probed-scan kernel, optional shard-local exact
    rerank (c_eff > 0, needs row-major raw_rows/raw_norms), ICI merge.

    Pass prebuilt ``recon``/``rnorms`` (from
    ``ShardedIVFPQ.build_recon_tables``) to skip the per-dispatch code
    decompression — the serving mode; otherwise each shard reconstructs
    its table inside the program and resting memory stays codes-only.
    Returns (dist (Q, k_eff), ids) replicated device arrays. shard_map
    composes under jit — the engine fuses the CNN embed in front."""
    from image_search_engine_tpu.index.ivf import _pq_reconstruct_table
    from image_search_engine_tpu.ops.ivf_pallas import ivf_probed_topk

    cap = lists.shape[1]
    kk = min(k_eff, nprobe * cap)
    prebuilt = recon is not None

    def shard_fn(qr, bcents_l, lists_local, pcodes_local, books_l,
                 *rest):
        it = iter(rest)
        if prebuilt:
            recon_l, rnorms_l = next(it), next(it)
        else:
            recon_l, rnorms_l = _pq_reconstruct_table(
                pcodes_local, books_l, bcents_l, lists_local >= 0, m)
        dloc, ids, ok = ivf_probed_topk(
            qr, bcents_l, recon_l, rnorms_l, lists_local,
            c_eff if c_eff else kk, nprobe,
        )
        if c_eff:
            # shard-local exact refine over the kernel's ADC shortlist
            # (ids are GLOBAL; this shard's raw rows are addressed by
            # id - shard base)
            raw_local, rnorm_local = next(it), next(it)
            ids = jnp.where(ok, ids, -1)
            dist = _local_exact_rerank(qr, ids, raw_local, rnorm_local,
                                       axis, rows_per_shard)
        else:
            dist = jnp.where(ok, dloc, jnp.inf)
            ids = jnp.where(ok, ids, -1)

        kk2 = min(k_eff, dist.shape[1])
        vals, pos = jax.lax.top_k(-dist, kk2)
        out_ids = jnp.take_along_axis(ids, pos, axis=1)
        d_all = jax.lax.all_gather(-vals, axis)
        i_all = jax.lax.all_gather(out_ids, axis)
        d_cat = jnp.swapaxes(d_all, 0, 1).reshape(qr.shape[0], -1)
        i_cat = jnp.swapaxes(i_all, 0, 1).reshape(qr.shape[0], -1)
        mvals, mpos = jax.lax.top_k(-d_cat, k_eff)
        mids = jnp.take_along_axis(i_cat, mpos, axis=1)
        return -mvals, mids

    in_specs = [P(), P(axis, None), P(axis, None), P(axis, None, None), P()]
    args = [q, bcents, lists, pcodes, books]
    if prebuilt:
        in_specs += [P(axis, None, None), P(axis, None)]
        args += [recon, rnorms]
    if c_eff:
        in_specs += [P(axis, None), P(axis)]
        args += [raw_rows, raw_norms]
    f = jax.shard_map(
        shard_fn, mesh=mesh, in_specs=tuple(in_specs),
        out_specs=(P(), P()), check_vma=False,
    )
    return f(*args)


def _local_exact_rerank(qr, cand, raw_local, rnorm_local, axis: str, r: int):
    """Exact re-score of shard-local candidates (GLOBAL row ids) against
    the shard's row-major raw rows: local row = id - shard_base (block
    partition). Pad/-1 candidates score +inf; rnorm pads carry +inf too,
    so out-of-corpus rows can never win the merge."""
    base = jax.lax.axis_index(axis) * r
    local = jnp.clip(cand - base, 0, r - 1)
    rows = raw_local[local]  # (Q, C, d)
    rn = rnorm_local[local]
    qn = jnp.sum(qr * qr, axis=1, keepdims=True)
    cross = jnp.einsum("qd,qcd->qc", qr, rows,
                       preferred_element_type=jnp.float32)
    exact = jnp.maximum(qn - 2.0 * cross + rn, 0.0)
    return jnp.where(cand >= 0, exact, jnp.inf)


class ShardedIVFPQ(ShardedIVF):
    """PQ-preserving ICI scale-out of ``index.ivf.IVFPQIndex``.

    Shard state per device: (nb, cap) global-id lists, (nb, d) bucket
    centroids (pads poisoned far), and (nb, cap, m) PACKED CODES — one
    byte-per-subspace compressed row storage, so an N-row corpus costs
    ~N*m bytes across the mesh instead of N*d*4. The (m, 256, dsub)
    codebooks and coarse centroids are replicated (a few hundred KB).
    Search = rank local buckets -> per-probe residual LUT -> ADC gather
    over the probed code blocks -> local top-k -> all_gather merge, all
    one shard_map program.
    """

    def __init__(self, mesh: Mesh, axis: str = "data", metric: str = "l2"):
        super().__init__(mesh, axis, metric)
        self.pq_books = None  # (m, 256, dsub) replicated
        self.packed_codes = None  # (S*nb, cap, m) sharded on first axis
        self.m = 0
        # exact-rerank state (optional, mirrors IVFPQIndex.rerank): raw
        # rows ROW-MAJOR per shard (global id - shard base addresses them
        # directly) so the refine stage stays shard-LOCAL — each shard
        # re-scores only its own ADC shortlist, then exact distances ride
        # the same all_gather merge
        self.rerank = 0
        self.raw_rows = None  # (S*r, d) row-sharded f32
        self.raw_norms = None  # (S*r,) sharded, +inf at pad rows

    @classmethod
    def from_codes(
        cls,
        codes: np.ndarray,
        row_cell: np.ndarray,
        centroids: np.ndarray,
        pq_books: np.ndarray,
        nprobe: int,
        mesh: Mesh,
        axis: str = "data",
        metric: str = "l2",
        raw: Optional[np.ndarray] = None,
        rerank: int = 0,
    ) -> "ShardedIVFPQ":
        """Build from an IVFPQ artifact's components — codes (N, m),
        per-row coarse-cell assignment (N,), cell centroids (nlist, d) and
        codebooks (m, 256, dsub). No raw vectors required: this is what
        lets a compressed (codes-only) artifact scale out compressed.

        ``raw`` (N, d) + ``rerank`` C adds the exact refine stage on the
        mesh: each shard re-scores its own top-C ADC shortlist from its
        local raw rows (no cross-shard vector traffic), so the merged
        ranking is exact over the store — recall parity with the
        single-chip ``IVFPQIndex.search(rerank=C)`` path. Costs N*d*4
        bytes across the mesh on top of the codes; artifacts saved
        codes-only cannot rerank (same rule as the single-chip path).
        """
        from image_search_engine_tpu.index.ivf import _build_buckets

        self = cls(mesh, axis, metric)
        codes = np.ascontiguousarray(codes)
        row_cell = np.asarray(row_cell)
        n, m = codes.shape
        nlist, d = centroids.shape
        s = mesh.shape[axis]
        r = round_up(-(-n // s), 8)  # rows per shard (block partition)

        per_shard = []
        for si in range(s):
            lo, hi = si * r, min((si + 1) * r, n)
            if lo >= n:
                # more devices than row blocks: an empty shard still needs
                # one (all-pad) bucket so shapes stay uniform
                lst = np.full((1, 8), -1, np.int32)
                b_cell = np.zeros(1, np.int32)
            else:
                lst, b_cell = _build_buckets(row_cell[lo:hi], nlist)
                lst = np.where(lst >= 0, lst + lo, -1).astype(np.int32)
            per_shard.append((lst, b_cell))
        cap = max(l.shape[1] for l, _ in per_shard)
        nb = max(l.shape[0] for l, _ in per_shard)
        lists = np.full((s, nb, cap), -1, np.int32)
        bcents = np.full((s, nb, d), 1e15, np.float32)
        # uint8 — one byte per subspace on device (the docstring's ~N*m
        # bytes across the mesh); ADC widens per one-hot slice below
        pcodes = np.zeros((s, nb, cap, m), np.uint8)
        for si, (l, b_cell) in enumerate(per_shard):
            lists[si, : l.shape[0], : l.shape[1]] = l
            bcents[si, : l.shape[0]] = centroids[b_cell]
            valid = l >= 0
            pcodes[si, : l.shape[0], : l.shape[1]][valid] = codes[l[valid]]

        rep = NamedSharding(mesh, P())
        shard0 = NamedSharding(mesh, P(axis, *([None] * 2)))
        self.centroids = jax.device_put(jnp.asarray(centroids, jnp.float32), rep)
        self.pq_books = jax.device_put(jnp.asarray(pq_books, jnp.float32), rep)
        self.lists = jax.device_put(
            jnp.asarray(lists.reshape(s * nb, cap)), NamedSharding(mesh, P(axis, None))
        )
        self.bucket_centroids = jax.device_put(
            jnp.asarray(bcents.reshape(s * nb, d)), NamedSharding(mesh, P(axis, None))
        )
        self.packed_codes = jax.device_put(
            jnp.asarray(pcodes.reshape(s * nb, cap, m)), shard0
        )
        if raw is not None:
            # row-major per shard: a candidate's raw row is raw_rows[id -
            # shard_base] — no packed duplicate, N*d*4 total on the mesh.
            # Streamed per shard block via make_array_from_callback: the
            # padded full-size host copy the round-3 build made (a second
            # N*d*4 high-water on top of `raw` itself) never exists.
            raw32 = np.asarray(raw)

            def _raw_block(index):
                lo = index[0].start or 0
                hi = index[0].stop if index[0].stop is not None else s * r
                blk = np.zeros((hi - lo, d), np.float32)
                if lo < n:
                    blk[: min(hi, n) - lo] = raw32[lo : min(hi, n)]
                return blk

            rn = np.full(s * r, np.inf, np.float32)
            step = max(1, (128 << 20) // max(d * 4, 1))
            for lo0 in range(0, n, step):  # chunked: no full-size square temp
                blk = raw32[lo0 : lo0 + step].astype(np.float32)
                rn[lo0 : lo0 + blk.shape[0]] = (blk * blk).sum(axis=1)
            self.raw_rows = jax.make_array_from_callback(
                (s * r, d), NamedSharding(mesh, P(axis, None)), _raw_block)
            self.raw_norms = jax.device_put(
                jnp.asarray(rn), NamedSharding(mesh, P(axis)))
            self.rerank = int(rerank)
        self.n = n
        self.m = m
        self.rows_per_shard = r
        self.nlist = nlist
        self.nbuckets = nb
        self.nprobe = int(min(nb, max(nprobe, -(-nprobe * nb // nlist))))
        return self

    @classmethod
    def from_index(cls, index, mesh: Mesh, axis: str = "data") -> "ShardedIVFPQ":
        """Reshard a loaded ``IVFPQIndex`` (raw vectors NOT required —
        but when the artifact carries them the exact-rerank refine stage
        survives the mesh too, including per-call ``search(rerank=C)``
        overrides, matching the single-chip API). A codes-only artifact
        built with a rerank shortlist downgrades to ADC ranking, loudly."""
        has_raw = getattr(index, "vectors", None) is not None
        if index.rerank and not has_raw:
            _log.warning(
                "ivfpq rerank=%d configured but the artifact is codes-only; "
                "the sharded index serves ADC ranking (save with "
                "store_raw=True / --pq-rerank to keep the refine stage)",
                index.rerank,
            )
        return cls.from_codes(
            index.codes, index.row_cells(), index.centroids, index.pq_books,
            index.nprobe, mesh, axis=axis, metric=index.metric,
            raw=index.vectors if has_raw else None,
            rerank=index.rerank if has_raw else 0,
        )

    def search_batched(self, q: np.ndarray, k: int,
                       rerank: Optional[int] = None
                       ) -> Tuple[np.ndarray, np.ndarray]:
        """Batch-throughput PQ search on the mesh: each shard decompresses
        its OWN codes into a bf16 reconstruction table
        (index/ivf._pq_reconstruct_table — scanning it IS ADC semantics up
        to bf16 rounding) and scans it with the fused probed-scan kernel;
        optional shard-local exact rerank, then the all_gather merge. The
        sharded sibling of ``IVFPQIndex.search_batched`` — the path that
        measured 252.4k QPS single-chip at 1M (BENCH_NOTES "recon-scan"),
        here at 1/S rows per shard. The table is a per-dispatch transient:
        resting mesh memory stays codes-only."""
        rerank = self.rerank if rerank is None else rerank
        if rerank and self.raw_rows is None:
            raise ValueError(
                "rerank needs raw vectors on the mesh; rebuild with "
                "from_codes(raw=...) or an artifact saved store_raw=True"
            )
        q = jnp.asarray(self._prep_query(q))
        nprobe = self.nprobe
        cap = self.lists.shape[1]
        k_eff = min(k, max(1, min(self.n,
                                  self.mesh.shape[self.axis] * nprobe * cap)))
        c_eff = (min(max(int(rerank), min(k_eff, nprobe * cap)), nprobe * cap)
                 if rerank else 0)
        dd, ii = jax.device_get(sharded_pq_recon_scan(
            q, self.bucket_centroids, self.lists, self.packed_codes,
            self.pq_books,
            raw_rows=self.raw_rows if c_eff else None,
            raw_norms=self.raw_norms if c_eff else None,
            mesh=self.mesh, axis=self.axis, nprobe=nprobe, m=self.m,
            rows_per_shard=self.rows_per_shard, k_eff=k_eff, c_eff=c_eff,
        ))
        return self._finish(np.array(dd), np.array(ii), k)

    def build_recon_tables(self):
        """Per-shard bf16 reconstruction tables + norms as SHARDED device
        arrays (one shard_map program) — the mesh analog of the
        single-chip ``recon_cache``: build once at serving startup, then
        pass to ``sharded_pq_recon_scan(recon=..., rnorms=...)`` so each
        dispatch skips the ~N*m one-hot decompression. Costs N*d*2 bytes
        across the mesh while resident; the artifact stays codes-only."""
        from image_search_engine_tpu.index.ivf import _pq_reconstruct_table

        m, axis = self.m, self.axis

        def fn(pcodes_local, bcents_l, lists_local, books):
            return _pq_reconstruct_table(
                pcodes_local, books, bcents_l, lists_local >= 0, m)

        f = jax.shard_map(
            fn, mesh=self.mesh,
            in_specs=(P(axis, None, None), P(axis, None), P(axis, None), P()),
            out_specs=(P(axis, None, None), P(axis, None)),
            check_vma=False,
        )
        return f(self.packed_codes, self.bucket_centroids, self.lists,
                 self.pq_books)

    def search(self, q: np.ndarray, k: int,
               rerank: Optional[int] = None) -> Tuple[np.ndarray, np.ndarray]:
        rerank = self.rerank if rerank is None else rerank
        if rerank and self.raw_rows is None:
            raise ValueError(
                "rerank needs raw vectors on the mesh; rebuild with "
                "from_codes(raw=...) or an artifact saved store_raw=True"
            )
        q = jnp.asarray(self._prep_query(q))
        from image_search_engine_tpu.index.ivf import _adc_probe_distances

        nprobe = self.nprobe
        cap = self.lists.shape[1]
        m = self.m
        axis = self.axis
        r = self.rows_per_shard
        k_eff = min(k, max(1, min(self.n, self.mesh.shape[axis] * nprobe * cap)))
        c_eff = min(max(int(rerank), k_eff), nprobe * cap) if rerank else 0

        def shard_fn(qr, bcents, lists_local, pcodes_local, books,
                     raw_local=None, rnorm_local=None):
            qn_ = qr.shape[0]
            # rank local buckets (pads poisoned far away)
            cn = jnp.sum(bcents * bcents, axis=1)
            cd = cn[None, :] - 2.0 * jnp.dot(qr, bcents.T,
                                             preferred_element_type=jnp.float32)
            _, probe = jax.lax.top_k(-cd, nprobe)  # (Q, nprobe)

            def per_probe(p):
                b = probe[:, p]
                cand = lists_local[b]  # (Q, cap) global ids
                # shared per-probe ADC scan (index/ivf.py — the MXU
                # one-hot formulation, one definition for both chips)
                dist = _adc_probe_distances(
                    qr, bcents[b], books, m, pcodes_local[b], cand >= 0)
                return dist, cand

            dists, cands = [], []
            for p in range(nprobe):
                dd, cc = per_probe(p)
                dists.append(dd)
                cands.append(cc)
            dist = jnp.concatenate(dists, axis=1)
            cand = jnp.concatenate(cands, axis=1)

            if c_eff:
                # shard-local refine (faiss IndexRefineFlat composed with
                # the sharded index): the top-C ADC shortlist re-scored
                # exactly from this shard's row-major raw rows (global id
                # - shard base), and the merged ranking below compares
                # EXACT distances across shards
                _, spos = jax.lax.top_k(-dist, c_eff)  # (Q, C)
                cand = jnp.take_along_axis(cand, spos, axis=1)
                dist = _local_exact_rerank(qr, cand, raw_local, rnorm_local,
                                           axis, r)

            kk = min(k_eff, c_eff or (nprobe * cap))
            vals, pos = jax.lax.top_k(-dist, kk)
            ids = jnp.take_along_axis(cand, pos, axis=1)

            d_all = jax.lax.all_gather(-vals, axis)  # (S, Q, kk)
            i_all = jax.lax.all_gather(ids, axis)
            d_cat = jnp.swapaxes(d_all, 0, 1).reshape(qn_, -1)
            i_cat = jnp.swapaxes(i_all, 0, 1).reshape(qn_, -1)
            mvals, mpos = jax.lax.top_k(-d_cat, k_eff)
            mids = jnp.take_along_axis(i_cat, mpos, axis=1)
            return -mvals, mids

        in_specs = [P(), P(axis, None), P(axis, None), P(axis, None, None), P()]
        args = [q, self.bucket_centroids, self.lists, self.packed_codes,
                self.pq_books]
        if c_eff:
            in_specs += [P(axis, None), P(axis)]
            args += [self.raw_rows, self.raw_norms]
        f = jax.shard_map(
            shard_fn,
            mesh=self.mesh,
            in_specs=tuple(in_specs),
            out_specs=(P(), P()),
            check_vma=False,
        )
        dd, ii = jax.device_get(f(*args))
        return self._finish(np.array(dd), np.array(ii), k)
