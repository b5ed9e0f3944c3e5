"""Unified fused one-transfer serving programs.

Every index family serves through the same structure: a traceable feature
prologue (CNN embed, or the BoVW describe->quantize->histogram->BM25
chain) composed with a traceable search core inside ONE jitted program,
one host transfer per query batch, every index-sized array riding as a
jit ARGUMENT (closures bake into the compiled program as constants —
remote_compile rejects ~512 MB; guarded by
test_fused_programs_close_over_no_arrays).

Round 3 wrote that structure out five times inside ``QueryEngine._build``
(flat, IVF, IVFPQ, sharded-IVF, sharded-IVFPQ) plus a sixth for BoVW,
with the certificate-escalation epilogue pasted twice. This module owns
it once:

  * ``make_batched_search`` — jit(prologue + core) with (k, c, t_margin)
    static, then the family's host epilogue over the single device_get;
  * two epilogues — ``certificate_epilogue`` (exact-search families:
    machine-checked per dispatch, escalates to a wide candidate margin on
    violation — ops/topk_pallas.topk_twophase) and ``finish_epilogue``
    (probed families: the index's own Faiss-shaped ``_finish``);
  * one family builder per index type, each a prologue-agnostic search
    core + its device arrays + its static-argument policy. The flat core
    serves BOTH the DNN flat path and BoVW (a BoVW index IS a FlatIndex
    over histograms), sharded or not — which is what makes sharded BoVW
    serving fused for free.

Reference parity: the serving search is backend/engine.py:49-55
(``index.search(features, k)`` through Faiss); the fusion, certificates
and micro-batching have no reference analog (its Flask dev server is
serial) — they are this framework's production serving bar.
"""

from __future__ import annotations

import logging
import threading
from typing import Callable, Optional, Tuple

import numpy as np

log = logging.getLogger(__name__)

#: candidate margin used when a dispatch's exactness certificate fails
#: (matches topk_twophase_safe / FlatIndex.search escalation)
WIDE_MARGIN = 32

BatchedSearch = Callable[[np.ndarray, int], Tuple[np.ndarray, np.ndarray]]


def make_batched_search(
    name: str,
    prologue: Callable,
    prologue_args: tuple,
    core: Callable,
    core_args: tuple,
    statics_fn: Callable[[int], Tuple[int, int]],
    epilogue: Callable,
    coordinator=None,
) -> BatchedSearch:
    """Compose a feature prologue and a search core into one jitted
    program and wrap it with the family's host epilogue.

    ``prologue(p_args, images) -> feats`` and
    ``core(feats, c_args, k, c, t_margin) -> out`` are traceable;
    ``prologue_args`` / ``core_args`` are device pytrees passed as jit
    arguments on every dispatch (never closures). ``statics_fn(k) ->
    (k_eff, c_eff)`` clamps the requested k to the family's candidate
    pool (c_eff is the rerank shortlist width, 0 when unused).
    ``epilogue(out, k, retry) -> (d, i)`` performs the one device_get;
    ``retry(t_margin=...)`` re-dispatches the same query at a wide
    candidate margin (certificate escalation).

    ``coordinator`` (serving/multihost.MultihostCoordinator) makes every
    dispatch — including the certificate retry — broadcast its (batch,
    k, t_margin) to the worker processes first, under the coordinator's
    lock so broadcast order is enqueue order. The returned function also
    carries ``raw_dispatch(images, k, t_margin)`` — the bare program
    enqueue the workers replay (no broadcast, no epilogue).
    """
    import jax
    import jax.numpy as jnp

    def fused(p_args, images, c_args, k, c, t_margin):
        feats = prologue(p_args, images)
        return core(feats, c_args, k, c, t_margin)

    # the guard test (test_fused_programs_close_over_no_arrays) intercepts
    # jax.jit calls on fused* functions and walks their closures — keep
    # the family-specific name so the guard covers every family
    fused.__name__ = name
    jfused = jax.jit(fused, static_argnames=("k", "c", "t_margin"))

    def raw_dispatch(images: np.ndarray, k: int, t_margin=None):
        k_eff, c_eff = statics_fn(k)
        return jfused(prologue_args, jnp.asarray(images, jnp.float32),
                      core_args, k=k_eff, c=c_eff, t_margin=t_margin)

    def dispatch(images: np.ndarray, k: int, t_margin=None):
        if coordinator is not None:
            with coordinator.lock:
                coordinator.announce(images, k, t_margin)
                return raw_dispatch(images, k, t_margin)
        return raw_dispatch(images, k, t_margin)

    def batched_search(images: np.ndarray, k: int):
        def run(t_margin=None):
            return dispatch(images, k, t_margin)

        return epilogue(run(), k, run)

    batched_search.raw_dispatch = raw_dispatch
    batched_search.dispatch = dispatch
    return batched_search


# --------------------------------------------------------------------------
# Epilogues (host side, one device transfer)
# --------------------------------------------------------------------------


def certificate_epilogue(descending: bool, stats=None, label: str = ""):
    """Exact-search epilogue: one transfer covering (d, i, cert); on a
    certificate violation re-run the dispatch at the wide margin (the
    data-dependent control flow that cannot live inside jit), then pad
    the Faiss-shaped (worst, -1) tail when k > candidate pool."""
    import jax

    def epilogue(out, k: int, retry):
        d, i, cert = jax.device_get(out)  # one host transfer
        cert = np.asarray(cert)
        if not cert.all():
            n_fail = int((~cert).sum())
            log.warning("%stop-k certificate failed for %d queries; "
                        "re-running at wide margin", label, n_fail)
            if stats is not None:
                stats.record_escalation(n_fail)
            d, i, cert2 = jax.device_get(retry(t_margin=WIDE_MARGIN))
            if not np.asarray(cert2).all():
                # matching FlatIndex.search's escalation reporting: results
                # are still served (best effort), but never silently
                n_still = int((~np.asarray(cert2)).sum())
                log.error(
                    "%stop-k certificate STILL failing for %d queries at "
                    "wide margin %d — serving best-effort results",
                    label, n_still, WIDE_MARGIN)
                if stats is not None:
                    stats.record_escalation(n_still)
        d, i = np.array(d), np.array(i)
        if d.shape[1] < k:
            worst = -np.inf if descending else np.inf
            d = np.pad(d, ((0, 0), (0, k - d.shape[1])), constant_values=worst)
            i = np.pad(i, ((0, 0), (0, k - i.shape[1])), constant_values=-1)
        return d, i

    return epilogue


def finish_epilogue(index):
    """Probed-family epilogue: one transfer, invalid slots to -1, then
    the index's Faiss-shaped ``_finish`` (k padding, cosine conversion,
    sort stability)."""
    import jax

    def epilogue(out, k: int, retry):
        del retry  # probed families carry no exactness certificate
        arrs = [np.array(a) for a in jax.device_get(out)]  # one transfer
        if len(arrs) == 3:
            d, i, ok = arrs
            i[~ok] = -1
        else:
            d, i = arrs
        return index._finish(d, i, k)

    return epilogue


# --------------------------------------------------------------------------
# Prologues (traceable feature extraction)
# --------------------------------------------------------------------------


def cnn_prologue(embedder, size: int, normalize: bool):
    """CNN embed prologue: preprocess -> backbone -> optional l2-normalize
    (one definition for every DNN family so the paths cannot silently
    diverge). prologue_args = (params, batch_stats)."""
    from image_search_engine_tpu.ops.distances import l2_normalize
    from image_search_engine_tpu.ops.image_ops import preprocess_for_cnn

    model = embedder.model
    norm_name = embedder.norm_name

    def prologue(p_args, images):
        params, batch_stats = p_args
        x = preprocess_for_cnn(images, size, norm=norm_name)
        variables = {"params": params}
        if batch_stats is not None:
            variables["batch_stats"] = batch_stats
        emb = model.apply(variables, x, train=False)
        if normalize:
            emb = l2_normalize(emb)
        return emb

    return prologue


def bovw_prologue(descriptor, pipeline, normalize: bool):
    """BoVW prologue: describe -> quantize -> histogram -> BM25 -> optional
    l2-normalize, the whole chain traced into the serving program (the
    staged host-hop chain measured 3.31x slower on chip — BENCH_NOTES
    "Fused BoVW serving"). prologue_args = (centroids, idf-or-None)."""
    import jax.numpy as jnp

    from image_search_engine_tpu.ops.bm25 import bm25_transform
    from image_search_engine_tpu.ops.distances import l2_normalize
    from image_search_engine_tpu.ops.histogram import batched_histograms
    from image_search_engine_tpu.ops.kmeans import assign_jax

    n_clusters = pipeline.n_clusters
    spherical = pipeline.spherical
    bm = pipeline.bm25
    avgdl = float(bm.avgdl_) if (bm.use_train_avgdl and bm.avgdl_) else None

    def prologue(p_args, images):
        cents_t, idf_t = p_args
        feats, valid = descriptor.describe_device(images)
        b, kp, dd = feats.shape
        rows = feats.reshape(-1, dd).astype(jnp.float32)
        if spherical:  # KMeans.transform parity (ops/kmeans.py)
            rows = l2_normalize(rows)
        codes, _ = assign_jax(rows, cents_t)
        hist = batched_histograms(codes.reshape(b, kp), valid, n_clusters)
        w = bm25_transform(
            hist, bm.k1, bm.k2, bm.b,
            avgdl=None if avgdl is None else jnp.float32(avgdl))
        if idf_t is not None:
            w = w * idf_t[None, :]
        if normalize:
            w = l2_normalize(w)
        return w

    return prologue


# --------------------------------------------------------------------------
# Family builders: search core + device arrays + static-argument policy
# --------------------------------------------------------------------------


def flat_family(index, stats=None, label: str = ""):
    """Exact flat search (serves DNN flat AND BoVW histograms), local or
    distributed: on a mesh the shard_map'd per-shard scan + ICI
    all_gather merge runs INSIDE the same program (shard_map composes
    under jit). Emits the exactness certificate either way — per-shard
    certs AND-reduce over ICI on the mesh (parallel/topk.py:198-204).
    chi2 (elementwise, no matmul form) rides the same structure through
    the fixed-memory chunked XLA scan (parallel/topk._chi2_topk_chunked);
    its scan is exhaustive, so the certificate is True by construction."""
    import jax

    from image_search_engine_tpu.parallel.topk import (
        distributed_topk, local_topk_with_norms)

    search_metric = "ip" if index.metric in ("ip", "cosine") else index.metric
    mesh_obj, mesh_axis = index.mesh, index.axis
    n_valid = index.store.n

    def core(emb, c_args, k, c, t_margin):
        store, norms, scales = c_args
        if mesh_obj is not None:
            return distributed_topk(
                emb, store, norms, k, search_metric, mesh_obj, mesh_axis,
                scales_sharded=scales, with_certificate=True,
                t_margin=t_margin,
            )
        return local_topk_with_norms(
            emb, store, norms, k, search_metric,
            # fused-kernel candidate machinery is sized for serving k;
            # k > 128 takes the exact XLA full scan (index/flat.py rule);
            # chi2 has no kernel (elementwise metric, chunked scan)
            use_pallas=(jax.default_backend() == "tpu" and k <= 128
                        and search_metric != "chi2"),
            scales=scales, with_certificate=True, t_margin=t_margin,
        )

    core_args = (index.store.vectors, index.store.norms, index.store.scales)
    statics_fn = lambda k: (min(k, n_valid), 0)  # noqa: E731
    epilogue = certificate_epilogue(
        descending=search_metric == "ip", stats=stats, label=label)
    return core, core_args, statics_fn, epilogue


def ivf_family(index):
    """Single-chip cell-probe: the fused probed-scan kernel over the
    list-contiguous packed table (ops/ivf_pallas.ivf_probed_topk via
    index/ivf._ivf_search_kernel)."""
    from image_search_engine_tpu.index.ivf import _ivf_search_kernel

    nprobe = index._effective_nprobe()
    max_list = index.lists.shape[1]
    bcents, lists_d, valid_d, packed_d, pnorms_d = index._device_arrays()

    def core(emb, c_args, k, c, t_margin):
        bcents_t, lists_t, valid_t, packed_t, pnorms_t = c_args
        return _ivf_search_kernel(
            emb, bcents_t, lists_t, valid_t, packed_t, pnorms_t,
            k, nprobe, max_list,
        )

    core_args = (bcents, lists_d, valid_d, packed_d, pnorms_d)
    pool = nprobe * max_list
    statics_fn = lambda k: (min(k, index.ntotal, pool), 0)  # noqa: E731
    return core, core_args, statics_fn, finish_epilogue(index)


def ivfpq_family(index):
    """Single-chip IVFPQ: codes decompressed ONCE at startup into a
    resident bf16 reconstruction table (scanning it IS ADC semantics up
    to bf16 rounding — index/ivf._pq_reconstruct_table), the probed-scan
    kernel + optional exact rerank in the same dispatch chain."""
    from image_search_engine_tpu.index.ivf import (
        _exact_rescore, _pq_reconstruct_table)
    from image_search_engine_tpu.ops.ivf_pallas import ivf_probed_topk

    nprobe = index._effective_nprobe()
    pool = nprobe * index.lists.shape[1]
    bcents, lists_d, valid_d, pcodes, books = index._device_arrays_pq()
    recon, rnorms = _pq_reconstruct_table(pcodes, books, bcents, valid_d,
                                          index.m)
    rerank = index.rerank
    if rerank and index.vectors is None:
        log.warning(
            "IVFPQ index configured with rerank=%d but the artifact holds "
            "codes only — serving ADC-ranked results (rebuild with "
            "--pq-rerank to keep raw vectors)", rerank)
        rerank = 0
    raw_d = index._device_raw() if rerank else None

    def core(emb, c_args, k, c, t_margin):
        bcents_t, lists_t, recon_t, rnorms_t, raw_t = c_args
        out = ivf_probed_topk(emb, bcents_t, recon_t, rnorms_t, lists_t,
                              c if c else k, nprobe)
        if c:
            out = _exact_rescore(emb, raw_t, out[1], out[2], k)
        return out

    core_args = (bcents, lists_d, recon, rnorms, raw_d)

    def statics_fn(k):
        k_eff = min(k, index.ntotal, pool)
        c_eff = min(max(rerank, k_eff), pool) if rerank else 0
        return k_eff, c_eff

    return core, core_args, statics_fn, finish_epilogue(index)


def sharded_ivf_family(index):
    """Mesh cell-probe: per-shard fused probed-scan kernel + ICI merge
    (parallel/ivf.sharded_ivf_scan) in one program."""
    from image_search_engine_tpu.parallel.ivf import sharded_ivf_scan

    nprobe = index.nprobe
    mesh_obj, mesh_axis = index.mesh, index.axis
    pool = mesh_obj.shape[mesh_axis] * nprobe * index.lists.shape[1]

    def core(emb, c_args, k, c, t_margin):
        bcents_t, packed_t, pnorms_t, lists_t = c_args
        return sharded_ivf_scan(
            emb, bcents_t, packed_t, pnorms_t, lists_t,
            mesh=mesh_obj, axis=mesh_axis, nprobe=nprobe, k_eff=k,
        )

    core_args = (index.bucket_centroids, index.packed, index.packed_norms,
                 index.lists)
    statics_fn = lambda k: (min(k, max(1, min(index.n, pool))), 0)  # noqa: E731
    return core, core_args, statics_fn, finish_epilogue(index)


def sharded_ivfpq_family(index):
    """Mesh PQ: per-shard probed scan over startup-resident SHARDED bf16
    reconstruction tables (build_recon_tables — the recon-cache analog)
    + optional shard-local exact rerank + ICI merge
    (parallel/ivf.sharded_pq_recon_scan)."""
    from image_search_engine_tpu.parallel.ivf import sharded_pq_recon_scan

    nprobe = index.nprobe
    cap = index.lists.shape[1]
    mesh_obj, mesh_axis = index.mesh, index.axis
    pool = mesh_obj.shape[mesh_axis] * nprobe * cap
    recon_t, rnorms_t = index.build_recon_tables()
    m_, rps = index.m, index.rows_per_shard
    rerank = index.rerank

    def core(emb, c_args, k, c, t_margin):
        (bcents_t, lists_t, pcodes_t, books_t, recon_a, rnorms_a,
         raw_t, rawn_t) = c_args
        return sharded_pq_recon_scan(
            emb, bcents_t, lists_t, pcodes_t, books_t,
            mesh=mesh_obj, axis=mesh_axis, nprobe=nprobe, m=m_,
            rows_per_shard=rps, k_eff=k, c_eff=c,
            raw_rows=raw_t, raw_norms=rawn_t,
            recon=recon_a, rnorms=rnorms_a,
        )

    def statics_fn(k):
        k_eff = min(k, max(1, min(index.n, pool)))
        c_eff = (min(max(rerank, min(k_eff, nprobe * cap)), nprobe * cap)
                 if rerank else 0)
        return k_eff, c_eff

    def core_args_for(c_eff):
        return (index.bucket_centroids, index.lists, index.packed_codes,
                index.pq_books, recon_t, rnorms_t,
                index.raw_rows if c_eff else None,
                index.raw_norms if c_eff else None)

    # raw rows ride only when the rerank stage is active (matching the
    # round-3 builder); c_eff depends only on whether rerank is
    # configured, not on k, so the arrays are stable across dispatches
    core_args = core_args_for(statics_fn(1)[1])
    return core, core_args, statics_fn, finish_epilogue(index)


# --------------------------------------------------------------------------
# Serving wrapper: host resize + optional micro-batching (every family)
# --------------------------------------------------------------------------


def wrap_serving(engine, batched_search: BatchedSearch, image_size: int, cfg):
    """The final per-request ``search(image, k)``: host resize to the
    index-build resolution, then a single dispatch — or, with
    ``--micro-batch``, routing through the MicroBatcher so concurrent
    uploads coalesce into one padded device batch. Applies uniformly to
    EVERY fused family (round 3 had it on flat only); the batcher is
    constructed lazily on first batched request (no idle worker thread
    when calibration decides OFF)."""
    from image_search_engine_tpu.engine import _resize_host

    s = image_size
    mb_mode = cfg.micro_batch_mode()
    if mb_mode == "off":
        def search(image: np.ndarray, k: int):
            return batched_search(_resize_host(image, s)[None], k)

        return search

    if mb_mode == "on":
        log.warning(
            "--micro-batch measured STRICTLY WORSE at every concurrency "
            "on remote-tunnel topologies (independent dispatches already "
            "pipeline through the device stream; BENCH_NOTES "
            "'Serving-layer scaling') — it only pays where per-dispatch "
            "overhead dominates device time; use --micro-batch auto to "
            "measure on your hardware")
    # "on": trust the flag. "auto": serve per-request until prewarm's
    # calibration measures that coalescing beats pipelined independent
    # dispatches HERE (prewarm is where both programs are warm, so the
    # timing is honest); with --no-prewarm there is nothing to measure
    # against, so auto stays off — say so loudly instead of silently
    # reporting "auto" with calibration never having run.
    if mb_mode == "auto" and not getattr(cfg, "prewarm", True):
        log.warning(
            "--micro-batch auto needs prewarm to calibrate; with "
            "--no-prewarm calibration never runs and queries serve "
            "UNBATCHED (drop --no-prewarm, or pass --micro-batch on/off "
            "explicitly)")
    engine._mb_calibrated = False  # surfaced via /stats ("calibrated")
    engine._use_batcher = mb_mode == "on"
    engine._batcher = None
    engine._batcher_lock = threading.Lock()
    engine._batched_search = batched_search
    if mb_mode == "auto":
        engine._mb_calibrate = dict(
            batched_search=batched_search, image_shape=(s, s, 3))
    # warm BOTH programs (B=1 and B=max) at startup — the first
    # concurrent burst must not hit a cold compile
    engine._extra_prewarm = lambda k: batched_search(
        np.zeros((cfg.micro_batch_max, s, s, 3), np.float32), k)

    def search(image: np.ndarray, k: int):
        if engine._use_batcher:
            if engine._batcher is None:
                from image_search_engine_tpu.serving.batching import MicroBatcher

                with engine._batcher_lock:
                    if engine._batcher is None:
                        engine._batcher = MicroBatcher(
                            batched_search, max_batch=cfg.micro_batch_max,
                            max_wait_ms=cfg.micro_batch_wait_ms,
                        )
            return engine._batcher.search(_resize_host(image, s), k)
        return batched_search(_resize_host(image, s)[None], k)

    return search
