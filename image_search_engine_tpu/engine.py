"""Query engine: HTTP serving around a jitted search path.

The reference's Flask app (backend/engine.py): ``POST /similar_images``
takes a multipart image upload and returns
``{"prediction": [[distance, base64_thumbnail, path], ...]}``
(engine.py:68-107). This keeps that exact HTTP contract — the reference's
React frontend works against it unchanged — on a stdlib threaded HTTP
server (flask isn't part of the compute story and isn't needed).

Differences from the reference, by design:
  * the BoVW query path never round-trips through a temp PNG on disk
    (reference engine.py:93-98 wrote ``.received.png`` and re-read it);
  * the DHASH path actually works and returns nearest-hamming matches (the
    reference's is broken — uses ``image_features`` before assignment,
    engine.py:83);
  * query embedding + search is one batched jitted path, reused across
    requests (no per-request compilation).

Also serves GET / with the packaged upload UI (frontend/index.html — the
same file works standalone over file://) and GET /healthz.
"""

from __future__ import annotations

import argparse
import email
import email.policy
import json
import logging
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path
from typing import Callable, List, Optional, Tuple

import numpy as np

from image_search_engine_tpu.config import Config, IndexType, Method
from image_search_engine_tpu.utils.imageio import decode_image_bytes, load_paths_csv, thumbnail_b64

log = logging.getLogger(__name__)

Prediction = List[Tuple[float, str, str]]  # (distance, b64 thumb, path)


# --------------------------------------------------------------------------
# Query backends: built once at startup (reference engine.py:110-137)
# --------------------------------------------------------------------------



def _resize_host(image: np.ndarray, size: int) -> np.ndarray:
    """Host-side PIL resize to the index-build resolution.

    Done OUTSIDE jit so the compiled query path sees one static shape for
    any upload resolution — and with the same resampler the indexer's
    loader used, so a corpus image queried against itself matches bit-for-
    bit (host-vs-device resampling differ slightly)."""
    if image.shape[:2] == (size, size):
        return np.asarray(image, np.float32)
    from PIL import Image as _Image

    im = _Image.fromarray((np.clip(image, 0.0, 1.0) * 255).astype(np.uint8))
    im = im.resize((size, size), _Image.BILINEAR)
    return np.asarray(im, np.float32) / 255.0


def _make_embed_fn(embedder, size: int, normalize: bool):
    """Shared embed prologue for the fused serving programs — flat, IVF
    and IVFPQ all jit the same preprocess -> backbone -> optional
    l2-normalize chain; one definition keeps the three paths from
    silently diverging. The returned fn is traced INSIDE each caller's
    jit (params/batch_stats/images are its arguments, never closures)."""
    from image_search_engine_tpu.ops.distances import l2_normalize
    from image_search_engine_tpu.ops.image_ops import preprocess_for_cnn

    model = embedder.model
    norm_name = embedder.norm_name

    def embed(params, batch_stats, images):
        x = preprocess_for_cnn(images, size, norm=norm_name)
        variables = {"params": params}
        if batch_stats is not None:
            variables["batch_stats"] = batch_stats
        emb = model.apply(variables, x, train=False)
        if normalize:
            emb = l2_normalize(emb)
        return emb

    return embed


def _fused_finish(index, out, k: int):
    """Shared IVF/IVFPQ fused-path epilogue: ONE host transfer covering
    (d, i, ok), invalid slots to -1, then the index's Faiss-shaped
    finish (sort stability / k padding)."""
    import jax

    d, i, ok = jax.device_get(out)  # one host transfer
    d, i, ok = np.array(d), np.array(i), np.array(ok)
    i[~ok] = -1
    return index._finish(d, i, k)


class QueryEngine:
    """Image -> ranked (distance, path) results for one configured method."""

    def __init__(self, cfg: Config, mesh=None, prewarm: bool = True):
        from image_search_engine_tpu.utils.profiling import ServingStats

        self.cfg = cfg
        self.paths = load_paths_csv(cfg.paths_file)
        self.stats = ServingStats()
        self.index = None  # set by index-backed methods (dnn/bovw)
        self.thumbs = None
        if cfg.thumbnails_path.exists():
            from image_search_engine_tpu.utils.imageio import ThumbnailCache

            cache = ThumbnailCache.load(cfg.thumbnails_path)
            if len(cache) == len(self.paths):
                self.thumbs = cache
                log.info("serving thumbnails from %s", cfg.thumbnails_path)
            else:
                log.warning(
                    "thumbnail cache has %d entries for %d paths; ignoring "
                    "(rebuild the index)", len(cache), len(self.paths),
                )
        self._search = self._build(cfg, mesh)
        if prewarm:
            self.prewarm()

    def prewarm(self) -> None:
        """Trigger jit compilation before the first real request (first-query
        latency is dominated by compile otherwise)."""
        t0 = time.time()
        dummy = np.zeros((self.cfg.resize_size, self.cfg.resize_size, 3), np.float32)
        try:
            # use the real default k so the compiled program matches the
            # first actual request (a different k is a different program)
            k_warm = min(self.cfg.num_images_to_return, max(1, len(self.paths)))
            self._search(dummy, k_warm)
            if getattr(self, "_extra_prewarm", None) is not None:
                self._extra_prewarm(k_warm)
        except Exception as e:  # noqa: BLE001 — prewarm failing must not block serving
            log.warning("prewarm failed (serving continues, first query compiles): %s", e)
            return
        t1 = time.time()
        # second dispatch = warm-path latency; the first includes
        # compile (or cache load) + device program load, which over a
        # remote tunnel can dominate by minutes (BENCH_NOTES "End-to-
        # end verify at HEAD") — log both so slow starts are
        # attributable without re-instrumenting. Its failure is NOT a
        # compile failure (compilation already succeeded above), so it
        # gets its own message rather than the "first query compiles" one.
        try:
            self._search(dummy, k_warm)
            log.info("prewarm finished in %.1fs (compile + first dispatch; "
                     "warm dispatch %.0f ms)", t1 - t0, (time.time() - t1) * 1e3)
        except Exception as e:  # noqa: BLE001
            log.warning("prewarm compiled in %.1fs but the warm timing "
                        "dispatch failed (serving continues): %s", t1 - t0, e)
        self._calibrate_micro_batch(k_warm)

    def _calibrate_micro_batch(self, k_warm: int) -> None:
        """``--micro-batch auto``: both serving programs are warm after
        prewarm, so measure pipelined independent dispatches vs one padded
        batch and route queries by the numbers instead of a guess (the
        guess is topology-dependent — BENCH_NOTES 'Serving-layer
        scaling')."""
        calib = getattr(self, "_mb_calibrate", None)
        if calib is None:
            return
        from image_search_engine_tpu.serving.batching import (
            measure_micro_batch_gain, micro_batch_pays)

        try:
            threaded_ms, batched_ms = measure_micro_batch_gain(
                calib["batched_search"], calib["image_shape"], k_warm,
                self.cfg.micro_batch_max,
            )
        except Exception as e:  # noqa: BLE001 — calibration must not block serving
            log.warning("micro-batch calibration failed; serving "
                        "per-request (batching OFF): %s", e)
            return
        self._use_batcher = micro_batch_pays(threaded_ms, batched_ms)
        log.info(
            "micro-batch auto-calibration: %.1f ms/query pipelined "
            "independent dispatches vs %.1f ms/query coalesced (B=%d) "
            "-> batching %s",
            threaded_ms, batched_ms, self.cfg.micro_batch_max,
            "ON" if self._use_batcher else "OFF",
        )

    def _build(self, cfg: Config, mesh) -> Callable[[np.ndarray, int], Tuple[np.ndarray, np.ndarray]]:
        if cfg.method == Method.DNN:
            from image_search_engine_tpu.index.flat import FlatIndex
            from image_search_engine_tpu.models.embedder import CNNEmbedder

            # mesh shards the INDEX; single-query embeds can't split over a
            # batch axis (batch=1), so the backbone runs replicated
            self._check_embedder_provenance(cfg)
            from image_search_engine_tpu.indexer import warn_if_random_backbone

            warn_if_random_backbone(cfg, "serving queries")
            embedder = CNNEmbedder(
                cfg.dnn_model.value, image_size=cfg.resize_size, batch_size=1,
                torch_weights=cfg.torch_weights,
            )
            index = self._load_index(cfg.dnn_index_path, cfg, mesh)
            self.index = index
            s = cfg.resize_size

            if isinstance(index, FlatIndex) and index.metric != "chi2":
                # fuse embed + search into ONE jitted program: embeddings
                # never round-trip to host between the backbone and the
                # index scan (each host hop costs a full RTT). On a mesh
                # the search step is the shard_map'd distributed top-k
                # (per-shard scan + ICI all_gather merge) INSIDE the same
                # program — shard_map composes under jit, so sharded
                # serving keeps the one-transfer-per-query structure too.
                import functools as _ft

                import jax
                import jax.numpy as jnp

                from image_search_engine_tpu.parallel.topk import (
                    distributed_topk, local_topk_with_norms)

                search_metric = "ip" if index.metric in ("ip", "cosine") else index.metric
                normalize = index.metric == "cosine"
                store_v, store_n = index.store.vectors, index.store.norms
                store_s = index.store.scales
                n_valid = index.store.n
                mesh_obj, mesh_axis = index.mesh, index.axis
                embed = _make_embed_fn(embedder, s, normalize)

                @_ft.partial(jax.jit, static_argnames=("k", "t_margin"))
                def fused(params, batch_stats, images, store, norms, scales, k,
                          t_margin=None):
                    emb = embed(params, batch_stats, images)
                    # the exactness certificate rides along in the same
                    # device->host transfer as the results (host-side
                    # escalation: data-dependent control flow can't live
                    # inside the jitted program)
                    if mesh_obj is not None:
                        return distributed_topk(
                            emb, store, norms, k, search_metric, mesh_obj,
                            mesh_axis, scales_sharded=scales,
                            with_certificate=True, t_margin=t_margin,
                        )
                    return local_topk_with_norms(
                        emb, store, norms, k, search_metric,
                        use_pallas=jax.default_backend() == "tpu",
                        scales=scales, with_certificate=True,
                        t_margin=t_margin,
                    )

                def batched_search(images: np.ndarray, k: int):
                    k_eff = min(k, n_valid)
                    out = fused(
                        embedder.params, embedder.batch_stats,
                        jnp.asarray(images, jnp.float32), store_v, store_n,
                        store_s, k_eff,
                    )
                    d, i, cert = jax.device_get(out)  # one host transfer
                    if not np.asarray(cert).all():
                        log.warning(
                            "top-k certificate failed for %d queries; "
                            "re-running at wide margin",
                            int((~np.asarray(cert)).sum()),
                        )
                        d, i, _ = jax.device_get(fused(
                            embedder.params, embedder.batch_stats,
                            jnp.asarray(images, jnp.float32), store_v,
                            store_n, store_s, k_eff, t_margin=32,
                        ))
                    d, i = np.array(d), np.array(i)
                    if d.shape[1] < k:
                        worst = -np.inf if search_metric == "ip" else np.inf
                        d = np.pad(d, ((0, 0), (0, k - d.shape[1])), constant_values=worst)
                        i = np.pad(i, ((0, 0), (0, k - i.shape[1])), constant_values=-1)
                    return d, i

                mb_mode = cfg.micro_batch_mode()
                if mb_mode != "off":
                    # collect concurrent uploads into one padded device batch
                    from image_search_engine_tpu.serving.batching import MicroBatcher

                    if mb_mode == "on":
                        log.warning(
                            "--micro-batch measured STRICTLY WORSE at every "
                            "concurrency on remote-tunnel topologies "
                            "(independent dispatches already pipeline through "
                            "the device stream; BENCH_NOTES 'Serving-layer "
                            "scaling') — it only pays where per-dispatch "
                            "overhead dominates device time; use "
                            "--micro-batch auto to measure on your hardware")
                    self._batcher = MicroBatcher(
                        batched_search, max_batch=cfg.micro_batch_max,
                        max_wait_ms=cfg.micro_batch_wait_ms,
                    )
                    # "on": trust the flag. "auto": serve per-request until
                    # prewarm's calibration measures that coalescing beats
                    # pipelined independent dispatches HERE (prewarm is where
                    # both programs are warm, so the timing is honest); with
                    # --no-prewarm there is nothing to measure against, so
                    # auto stays off.
                    self._use_batcher = mb_mode == "on"
                    if mb_mode == "auto":
                        self._mb_calibrate = dict(
                            batched_search=batched_search,
                            image_shape=(s, s, 3),
                        )
                    # warm BOTH programs (B=1 and B=max) at startup — the
                    # first concurrent burst must not hit a cold compile
                    self._extra_prewarm = lambda k: batched_search(
                        np.zeros((cfg.micro_batch_max, s, s, 3), np.float32), k
                    )

                    def search(image: np.ndarray, k: int):
                        if self._use_batcher:
                            return self._batcher.search(_resize_host(image, s), k)
                        return batched_search(_resize_host(image, s)[None], k)

                    return search

                def search(image: np.ndarray, k: int):
                    return batched_search(_resize_host(image, s)[None], k)

                return search

            from image_search_engine_tpu.parallel.ivf import (
                ShardedIVF, ShardedIVFPQ, sharded_ivf_scan,
                sharded_pq_recon_scan)

            if isinstance(index, ShardedIVFPQ):
                # mesh PQ serving, fused: CNN embed + per-shard probed scan
                # over startup-resident SHARDED bf16 reconstruction tables
                # (the recon_cache analog, build_recon_tables) + optional
                # shard-local exact rerank + ICI merge — one jitted
                # program, one host transfer per query. All index-sized
                # arrays ride as jit arguments (closure-bake rule).
                import functools as _ft

                import jax
                import jax.numpy as jnp

                normalize = index.metric == "cosine"
                nprobe = index.nprobe
                cap = index.lists.shape[1]
                pool = index.mesh.shape[index.axis] * nprobe * cap
                recon_t, rnorms_t = index.build_recon_tables()
                mesh_obj, mesh_axis = index.mesh, index.axis
                m_, rps = index.m, index.rows_per_shard
                rerank = index.rerank
                embed = _make_embed_fn(embedder, s, normalize)

                @_ft.partial(jax.jit, static_argnames=("k", "c"))
                def fused_sharded_pq(params, batch_stats, images, bcents_t,
                                     lists_t, pcodes_t, books_t, recon_a,
                                     rnorms_a, raw_t, rawn_t, k, c):
                    emb = embed(params, batch_stats, images)
                    return sharded_pq_recon_scan(
                        emb, bcents_t, lists_t, pcodes_t, books_t,
                        mesh=mesh_obj, axis=mesh_axis, nprobe=nprobe, m=m_,
                        rows_per_shard=rps, k_eff=k, c_eff=c,
                        raw_rows=raw_t, raw_norms=rawn_t,
                        recon=recon_a, rnorms=rnorms_a,
                    )

                def search(image: np.ndarray, k: int):
                    k_eff = min(k, max(1, min(index.n, pool)))
                    c_eff = (min(max(rerank, min(k_eff, nprobe * cap)),
                                 nprobe * cap) if rerank else 0)
                    out = fused_sharded_pq(
                        embedder.params, embedder.batch_stats,
                        jnp.asarray(_resize_host(image, s)[None], jnp.float32),
                        index.bucket_centroids, index.lists,
                        index.packed_codes, index.pq_books, recon_t, rnorms_t,
                        index.raw_rows if c_eff else None,
                        index.raw_norms if c_eff else None, k_eff, c_eff,
                    )
                    d, i = jax.device_get(out)
                    return index._finish(np.array(d), np.array(i), k)

                return search

            if isinstance(index, ShardedIVF):
                # mesh cell-probe serving, fused: CNN embed + per-shard
                # fused probed-scan kernel + ICI merge in one program
                import functools as _ft

                import jax
                import jax.numpy as jnp

                normalize = index.metric == "cosine"
                nprobe = index.nprobe
                pool = index.mesh.shape[index.axis] * nprobe * index.lists.shape[1]
                mesh_obj, mesh_axis = index.mesh, index.axis
                embed = _make_embed_fn(embedder, s, normalize)

                @_ft.partial(jax.jit, static_argnames=("k",))
                def fused_sharded_ivf(params, batch_stats, images, bcents_t,
                                      packed_t, pnorms_t, lists_t, k):
                    emb = embed(params, batch_stats, images)
                    return sharded_ivf_scan(
                        emb, bcents_t, packed_t, pnorms_t, lists_t,
                        mesh=mesh_obj, axis=mesh_axis, nprobe=nprobe, k_eff=k,
                    )

                def search(image: np.ndarray, k: int):
                    k_eff = min(k, max(1, min(index.n, pool)))
                    out = fused_sharded_ivf(
                        embedder.params, embedder.batch_stats,
                        jnp.asarray(_resize_host(image, s)[None], jnp.float32),
                        index.bucket_centroids, index.packed,
                        index.packed_norms, index.lists, k_eff,
                    )
                    d, i = jax.device_get(out)
                    return index._finish(np.array(d), np.array(i), k)

                return search

            from image_search_engine_tpu.index.ivf import IVFIndex, IVFPQIndex

            if type(index) is IVFPQIndex:
                # fuse embed + PQ search into one jitted program, one host
                # transfer per query. The codes are decompressed ONCE at
                # startup into a resident bf16 reconstruction table
                # (N*d*2 B — the serving recon-cache mode; scanning it IS
                # ADC semantics up to bf16 rounding, see
                # _pq_reconstruct_table), and the probed-scan kernel +
                # optional exact rerank run in the same dispatch chain.
                # The generic path paid 2 host hops + the ADC path's 3
                # readbacks (~75 ms measured at 1M; BENCH_NOTES "IVFPQ at
                # 1M"). Big arrays ride as ARGUMENTS, not closures — jit
                # bakes closed-over arrays into the shipped program
                # (remote_compile rejects ~512 MB constants).
                import functools as _ft

                import jax
                import jax.numpy as jnp

                from image_search_engine_tpu.index.ivf import (
                    _exact_rescore, _pq_reconstruct_table)
                from image_search_engine_tpu.ops.ivf_pallas import ivf_probed_topk

                normalize = index.metric == "cosine"
                nprobe = index._effective_nprobe()
                max_list = index.lists.shape[1]
                pool = nprobe * max_list
                bcents, lists_d, valid_d, pcodes, books = index._device_arrays_pq()
                recon, rnorms = _pq_reconstruct_table(
                    pcodes, books, bcents, valid_d, index.m)
                rerank = index.rerank
                if rerank and index.vectors is None:
                    log.warning(
                        "IVFPQ index configured with rerank=%d but the "
                        "artifact holds codes only — serving ADC-ranked "
                        "results (rebuild with --pq-rerank to keep raw "
                        "vectors)", rerank)
                    rerank = 0
                raw_d = index._device_raw() if rerank else None
                embed = _make_embed_fn(embedder, s, normalize)

                # EVERY index-sized array rides as a jit argument (recon /
                # rnorms / raw are O(N*d); bcents / lists are O(N) too) —
                # closures bake into the compiled program as constants
                # (remote_compile rejects ~512 MB; even MBs bloat the
                # compile cache). Guarded by
                # test_fused_programs_close_over_no_arrays.
                @_ft.partial(jax.jit, static_argnames=("k", "c"))
                def fused_pq(params, batch_stats, images, bcents_t, lists_t,
                             recon_t, rnorms_t, raw_t, k, c):
                    emb = embed(params, batch_stats, images)
                    out = ivf_probed_topk(emb, bcents_t, recon_t, rnorms_t,
                                          lists_t, c if c else k, nprobe)
                    if c:
                        out = _exact_rescore(emb, raw_t, out[1], out[2], k)
                    return out

                def search(image: np.ndarray, k: int):
                    k_eff = min(k, index.ntotal, pool)
                    c_eff = min(max(rerank, k_eff), pool) if rerank else 0
                    out = fused_pq(
                        embedder.params, embedder.batch_stats,
                        jnp.asarray(_resize_host(image, s)[None], jnp.float32),
                        bcents, lists_d, recon, rnorms, raw_d, k_eff, c_eff,
                    )
                    return _fused_finish(index, out, k)

                return search

            if type(index) is IVFIndex:
                # fuse embed + probed IVF scan into one jitted program —
                # the unfused path pays two extra host hops (embeddings
                # come back to host, then go back out with the search),
                # each a full RTT on the serving path
                import functools as _ft

                import jax
                import jax.numpy as jnp

                from image_search_engine_tpu.index.ivf import _ivf_search_kernel

                normalize = index.metric == "cosine"
                nprobe = index._effective_nprobe()
                max_list = index.lists.shape[1]
                bcents, lists_d, valid_d, packed_d, pnorms_d = index._device_arrays()
                embed = _make_embed_fn(embedder, s, normalize)

                # EVERY index-sized array rides as a jit argument — above
                # all packed_t, the full packed vector table (~N*d*4 B,
                # GBs at 1M), but also the O(N) lists/valid/bucket-centroid
                # arrays. Closures bake into the compiled program as
                # constants (remote_compile rejects ~512 MB; even MBs bloat
                # the compile cache). Guarded by
                # test_fused_programs_close_over_no_arrays.
                @_ft.partial(jax.jit, static_argnames=("k",))
                def fused_ivf(params, batch_stats, images, bcents_t,
                              lists_t, valid_t, packed_t, pnorms_t, k):
                    emb = embed(params, batch_stats, images)
                    return _ivf_search_kernel(
                        emb, bcents_t, lists_t, valid_t, packed_t, pnorms_t,
                        k, nprobe, max_list,
                    )

                def search(image: np.ndarray, k: int):
                    k_eff = min(k, index.ntotal, nprobe * max_list)
                    out = fused_ivf(
                        embedder.params, embedder.batch_stats,
                        jnp.asarray(_resize_host(image, s)[None], jnp.float32),
                        bcents, lists_d, valid_d, packed_d, pnorms_d, k_eff,
                    )
                    return _fused_finish(index, out, k)

                return search

            def search(image: np.ndarray, k: int):
                # resize BEFORE the jitted embed so the backbone compiles
                # once for (1, s, s, 3) instead of per upload resolution
                feat = embedder.embed_batch(_resize_host(image, s)[None])
                return index.search(feat, k)

            return search

        if cfg.method == Method.BOVW:
            from image_search_engine_tpu.bovw.pipeline import BoVWPipeline
            from image_search_engine_tpu.descriptors import make_descriptor
            from image_search_engine_tpu.index.flat import FlatIndex

            pipeline = BoVWPipeline.load(cfg.bovw_pipeline_path)
            if pipeline.descriptor_kind:
                # the artifact records which feature pipeline built it —
                # reconstruct THAT, regardless of this process's config (a
                # mismatched descriptor family is a shape error)
                from image_search_engine_tpu.config import CornerDescriptorKind

                dp = pipeline.descriptor_params or {}
                art_cfg = Config(
                    method=Method.BOVW,
                    corner_descriptor=CornerDescriptorKind(pipeline.descriptor_kind),
                    max_descriptors_per_image=int(dp.get("max_keypoints", 256)),
                    daisy_step=int(dp.get("daisy_step", 32)),
                    daisy_radius=int(dp.get("daisy_radius", 32)),
                    # pre-pyramid artifacts (round 1) default to single-scale
                    # so their codebooks keep seeing the geometry that built
                    # them
                    corner_n_levels=int(dp.get("n_levels", 1)),
                    corner_scale_step=float(dp.get("scale_step", 1.25)),
                )
                descriptor = make_descriptor(art_cfg)
                s = int(dp.get("resize_size", cfg.resize_size))
            else:
                descriptor = make_descriptor(cfg)
                s = cfg.resize_size
            index = FlatIndex.load(cfg.bovw_index_path, mesh=mesh)
            self.index = index

            if (index.mesh is None and index.metric != "chi2"
                    and hasattr(descriptor, "describe_device")):
                # fuse describe -> quantize -> histogram -> BM25 -> top-k
                # into ONE jitted program with ONE host transfer. The
                # generic sequence below pays a host hop between every
                # stage (each a full RTT on the serving path — the DNN
                # fused paths measured 1.6-2.1x from removing hops,
                # BENCH_NOTES "Fused raw-IVF serving"). Index-sized arrays
                # (codebook centroids, store, norms) ride as jit ARGUMENTS
                # — closures bake into the compiled program as constants
                # (remote_compile rejects ~512 MB). Guarded by
                # test_fused_programs_close_over_no_arrays.
                import functools as _ft

                import jax
                import jax.numpy as jnp

                from image_search_engine_tpu.ops.bm25 import bm25_transform
                from image_search_engine_tpu.ops.distances import l2_normalize
                from image_search_engine_tpu.ops.histogram import batched_histograms
                from image_search_engine_tpu.ops.kmeans import assign_jax
                from image_search_engine_tpu.parallel.topk import local_topk_with_norms

                n_clusters = pipeline.n_clusters
                spherical = pipeline.spherical
                bm = pipeline.bm25
                avgdl = (float(bm.avgdl_)
                         if (bm.use_train_avgdl and bm.avgdl_) else None)
                idf = (jnp.asarray(bm.idf_)
                       if (bm.apply_idf and bm.idf_ is not None) else None)
                cents = jnp.asarray(pipeline.kmeans.cluster_centers_, jnp.float32)
                search_metric = "ip" if index.metric in ("ip", "cosine") else index.metric
                normalize = index.metric == "cosine"
                store_v, store_n = index.store.vectors, index.store.norms
                store_s = index.store.scales
                n_valid = index.store.n

                @_ft.partial(jax.jit, static_argnames=("k", "t_margin"))
                def fused_bovw(images, cents_t, idf_t, store, norms, scales,
                               k, t_margin=None):
                    feats, valid = descriptor.describe_device(images)
                    b, kp, dd = feats.shape
                    rows = feats.reshape(-1, dd).astype(jnp.float32)
                    if spherical:  # KMeans.transform parity (ops/kmeans.py)
                        rows = l2_normalize(rows)
                    codes, _ = assign_jax(rows, cents_t)
                    hist = batched_histograms(
                        codes.reshape(b, kp), valid, n_clusters)
                    w = bm25_transform(
                        hist, bm.k1, bm.k2, bm.b,
                        avgdl=None if avgdl is None else jnp.float32(avgdl))
                    if idf_t is not None:
                        w = w * idf_t[None, :]
                    if normalize:
                        w = l2_normalize(w)
                    return local_topk_with_norms(
                        w, store, norms, k, search_metric,
                        use_pallas=(jax.default_backend() == "tpu" and k <= 128),
                        scales=scales, with_certificate=True, t_margin=t_margin,
                    )

                def search(image: np.ndarray, k: int):
                    k_eff = min(k, n_valid)
                    img = jnp.asarray(_resize_host(image, s)[None], jnp.float32)
                    out = fused_bovw(img, cents, idf, store_v, store_n,
                                     store_s, k_eff)
                    d, i, cert = jax.device_get(out)  # one host transfer
                    if not np.asarray(cert).all():
                        log.warning("BoVW top-k certificate failed for %d "
                                    "queries; re-running at wide margin",
                                    int((~np.asarray(cert)).sum()))
                        d, i, _ = jax.device_get(fused_bovw(
                            img, cents, idf, store_v, store_n, store_s,
                            k_eff, t_margin=32))
                    d, i = np.array(d), np.array(i)
                    if d.shape[1] < k:
                        worst = -np.inf if search_metric == "ip" else np.inf
                        d = np.pad(d, ((0, 0), (0, k - d.shape[1])),
                                   constant_values=worst)
                        i = np.pad(i, ((0, 0), (0, k - i.shape[1])),
                                   constant_values=-1)
                    return d, i

                return search

            def search(image: np.ndarray, k: int):
                # generic fallback (sharded index / chi2 metric): match the
                # index-build image size (descriptor grids/keypoint budgets
                # are resolution-dependent)
                img = _resize_host(image, s)
                feats, valid = descriptor.describe_batch(img[None])
                hist = pipeline.transform(feats, valid)
                return index.search(hist.astype(np.float32), k)

            return search

        if cfg.method == Method.DHASH:
            from image_search_engine_tpu.ops.dhash import dhash_bits, hamming_topk
            from image_search_engine_tpu.ops.image_ops import rgb_to_gray

            z = np.load(cfg.dhash_store_path, allow_pickle=False)
            bits = z["bits"]
            s = cfg.resize_size

            def search(image: np.ndarray, k: int):
                import jax.numpy as jnp

                img = jnp.asarray(_resize_host(image, s))
                qb = dhash_bits(rgb_to_gray(img[None]))
                d, i = hamming_topk(np.asarray(qb), bits, min(k, bits.shape[0]))
                return np.asarray(d), np.asarray(i)

            return search

        raise ValueError(f"unsupported method {cfg.method}")

    @staticmethod
    def _check_embedder_provenance(cfg: Config) -> None:
        """Warn when this process's backbone differs from the one that
        built the index (embedder.json, written by the indexer): serving
        would silently return garbage rankings otherwise."""
        import json

        from image_search_engine_tpu.indexer import EMBEDDER_ARCH, _torch_weights_sha

        meta_path = cfg.artifacts_dir / "embedder.json"
        if not meta_path.exists():
            # pre-provenance index (built before embedder.json existed):
            # backbone geometry has since changed (EMBEDDER_ARCH), so the
            # stored embeddings may live in a different space — say so
            # instead of silently serving degraded rankings
            log.warning(
                "no embedder.json in %s — this index predates provenance "
                "tracking (current arch tag %r); if it was built with an "
                "older backbone geometry, rankings will be silently "
                "degraded. Rebuild the index to attach provenance.",
                cfg.artifacts_dir, EMBEDDER_ARCH,
            )
            return
        try:
            meta = json.loads(meta_path.read_text())
        except (OSError, json.JSONDecodeError):
            return
        # a bad path falls through to the embedder's own (clearer) error;
        # hashing a multi-hundred-MB checkpoint per start is an accepted
        # cost — it is what makes the check trustworthy
        try:
            sha = _torch_weights_sha(cfg)
        except OSError:
            sha = None
        mismatches = []
        if meta.get("model") != cfg.dnn_model.value:
            mismatches.append(f"model {meta.get('model')} vs {cfg.dnn_model.value}")
        if meta.get("resize_size") != cfg.resize_size:
            mismatches.append(
                f"resize_size {meta.get('resize_size')} vs {cfg.resize_size}")
        if meta.get("arch") != EMBEDDER_ARCH:
            mismatches.append(
                f"arch {meta.get('arch')} vs {EMBEDDER_ARCH} (rebuild the index)")
        if meta.get("torch_weights_sha256") != sha:
            mismatches.append("torch weights differ from the index build's")
        if mismatches:
            log.warning(
                "embedder mismatch vs index build (%s) — query embeddings "
                "will not live in the stored index's space; results will be "
                "unreliable. Rebuild the index or match the flags.",
                "; ".join(mismatches),
            )

    @staticmethod
    def _load_index(path, cfg: Config, mesh):
        if cfg.index_type == IndexType.IVFPQ:
            from image_search_engine_tpu.index.ivf import IVFPQIndex
            from image_search_engine_tpu.parallel.ivf import ShardedIVFPQ

            index = IVFPQIndex.load(path, mesh=mesh)
            if mesh is not None:
                # scale out KEEPING the compression: per-shard packed codes
                # + replicated books (round 1 silently rebuilt a raw-vector
                # ShardedIVF here — dropping PQ's whole point — or, for a
                # codes-only artifact, silently ignored the mesh)
                # from_index carries raw rows + the rerank shortlist onto
                # the mesh when the artifact has them (shard-local exact
                # refine, merged on exact distances) and warns when a
                # rerank-configured artifact is codes-only
                return ShardedIVFPQ.from_index(index, mesh)
            return index
        if cfg.index_type == IndexType.CELL_PROBE:
            from image_search_engine_tpu.index.ivf import IVFIndex

            index = IVFIndex.load(path, mesh=mesh)
            if mesh is not None:
                from image_search_engine_tpu.parallel.ivf import ShardedIVF

                if index.vectors is None:
                    raise ValueError(
                        f"cell-probe index {path} holds no raw vectors; "
                        "cannot shard it over the mesh (rebuild the index)"
                    )
                return ShardedIVF.from_components(
                    index.vectors, index.centroids, index.nprobe, mesh,
                    metric=index.metric, table_dtype=index.table_dtype,
                )
            return index
        from image_search_engine_tpu.index.flat import FlatIndex

        return FlatIndex.load(path, mesh=mesh)

    def query(self, image: np.ndarray, k: Optional[int] = None) -> Prediction:
        k = k or self.cfg.num_images_to_return
        t0 = time.time()
        try:
            dists, ids = self._search(image, k)
        except Exception:
            self.stats.record(time.time() - t0, error=True)
            raise
        search_s = time.time() - t0
        self.stats.record(search_s)
        out: Prediction = []
        for dist, idx in zip(dists[0].tolist(), ids[0].tolist()):
            if idx < 0 or idx >= len(self.paths):
                continue
            path = self.paths[idx]
            if self.thumbs is not None:
                thumb = self.thumbs.get_b64(idx)
            else:
                try:
                    thumb = thumbnail_b64(path, self.cfg.thumbnail_size)
                except Exception:  # noqa: BLE001 — missing/corrupt corpus file
                    thumb = ""
            out.append((round(float(dist), 4), thumb, path))
        log.info("query: search %.1fms, total %.1fms, %d hits",
                 search_s * 1e3, (time.time() - t0) * 1e3, len(out))
        return out


# --------------------------------------------------------------------------
# HTTP layer
# --------------------------------------------------------------------------

# file-missing fallback ONLY — the real page is the packaged
# frontend/index.html (single source of truth, reference App.js parity);
# this minimal copy keeps GET / alive if package data was stripped.
_UI_FALLBACK_HTML = """<!doctype html>
<html><head><title>tpu image search</title><style>
body{font-family:sans-serif;margin:2rem;background:#fafafa}
#grid{display:grid;grid-template-columns:repeat(5,1fr);gap:12px;margin-top:1rem}
.card{background:#fff;border-radius:8px;padding:8px;box-shadow:0 1px 3px #0002}
.card img{width:100%;border-radius:4px}.d{color:#555;font-size:12px}
</style></head><body>
<h2>TPU image search</h2>
<input type="file" id="f" accept="image/*">
<div id="grid"></div>
<script>
document.getElementById('f').onchange = async (e) => {
  const fd = new FormData(); fd.append('image', e.target.files[0]);
  const r = await fetch('/similar_images', {method:'POST', body: fd});
  const js = await r.json();
  document.getElementById('grid').innerHTML = js.prediction.map(p =>
    `<div class="card"><img src="data:image/jpeg;base64,${p[1]}">
     <div class="d">${Number(p[0]).toFixed(3)}<br>${p[2]}</div></div>`).join('');
};
</script></body></html>"""


def _ui_html() -> str:
    """The GET / page: the packaged frontend/index.html (one source of
    truth — the same file works standalone over file://, like the
    reference's CRA app), falling back to the inline copy only when the
    package data is missing."""
    try:
        from importlib import resources

        return (
            resources.files("image_search_engine_tpu.frontend")
            .joinpath("index.html")
            .read_text(encoding="utf-8")
        )
    except Exception as e:  # noqa: BLE001 — a stripped install still serves
        log.warning("packaged frontend/index.html unavailable (%s); "
                    "serving the minimal fallback page", e)
        return _UI_FALLBACK_HTML


def _parse_multipart(headers, body: bytes) -> Optional[bytes]:
    """Extract the first file part from a multipart/form-data body."""
    ctype = headers.get("Content-Type", "")
    if "multipart/form-data" not in ctype:
        return None
    msg = email.message_from_bytes(
        f"Content-Type: {ctype}\r\n\r\n".encode() + body, policy=email.policy.HTTP
    )
    for part in msg.iter_parts():
        payload = part.get_payload(decode=True)
        if payload:
            return payload
    return None


def make_handler(engine: QueryEngine):
    class Handler(BaseHTTPRequestHandler):
        def _json(self, code: int, payload) -> None:
            blob = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Access-Control-Allow-Origin", "*")  # CORS, like flask_cors
            self.send_header("Content-Length", str(len(blob)))
            self.end_headers()
            self.wfile.write(blob)

        def do_GET(self):  # noqa: N802 (stdlib API)
            if self.path == "/healthz":
                self._json(200, {"status": "ok", "corpus": len(engine.paths)})
                return
            if self.path == "/stats":
                snap = engine.stats.snapshot()
                mb = engine.cfg.micro_batch_mode()
                if mb != "off":
                    # surface the (possibly auto-calibrated) routing so an
                    # operator can see which path requests actually take
                    snap["micro_batch"] = {
                        "mode": mb,
                        "active": bool(getattr(engine, "_use_batcher", False)),
                    }
                self._json(200, snap)
                return
            if self.path not in ("/", "/index.html"):
                self._json(404, {"error": "unknown endpoint"})
                return
            page = _ui_html().encode()
            self.send_response(200)
            self.send_header("Content-Type", "text/html")
            self.send_header("Content-Length", str(len(page)))
            self.end_headers()
            self.wfile.write(page)

        def do_OPTIONS(self):  # noqa: N802
            self.send_response(204)
            self.send_header("Access-Control-Allow-Origin", "*")
            self.send_header("Access-Control-Allow-Methods", "POST, GET, OPTIONS")
            self.send_header("Access-Control-Allow-Headers", "*")
            self.end_headers()

        def do_POST(self):  # noqa: N802
            if self.path != "/similar_images":
                self._json(404, {"error": "unknown endpoint"})
                return
            length = int(self.headers.get("Content-Length", 0))
            body = self.rfile.read(length)
            data = _parse_multipart(self.headers, body)
            if data is None:
                # 400 on missing upload (reference engine.py:72-73)
                self._json(400, {"error": "no image uploaded"})
                return
            try:
                image = decode_image_bytes(data)
            except Exception as e:  # noqa: BLE001
                self._json(400, {"error": f"undecodable image: {e}"})
                return
            try:
                prediction = engine.query(image)
            except Exception as e:  # noqa: BLE001 — a failed query must
                # answer 500, not kill the connection with an empty reply
                log.exception("query failed")
                self._json(500, {"error": f"query failed: {e}"})
                return
            self._json(200, {"prediction": prediction})

        def log_message(self, fmt, *args):  # quieter: route through logging
            log.debug("%s - %s", self.address_string(), fmt % args)

    return Handler


def serve(cfg: Config, mesh=None, prewarm: Optional[bool] = None) -> None:
    prewarm = cfg.prewarm if prewarm is None else prewarm
    if mesh is None:
        from image_search_engine_tpu.parallel.mesh import mesh_from_config

        mesh = mesh_from_config(cfg)  # None unless --sharded/--dcn-* asked
        if mesh is not None:
            log.info("sharded serving over a %d-device mesh",
                     mesh.devices.size)
    engine = QueryEngine(cfg, mesh=mesh, prewarm=prewarm)
    httpd = ThreadingHTTPServer((cfg.host, cfg.port), make_handler(engine))
    log.info("serving %s on http://%s:%d (corpus: %d images)",
             cfg.method.value, cfg.host, cfg.port, len(engine.paths))
    httpd.serve_forever()


def parse_args(argv=None) -> Config:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--artifacts-dir", type=Path, default=Path("artifacts"))
    ap.add_argument("--method", choices=[m.value for m in Method], default="dnn")
    ap.add_argument("--index-type", choices=[t.value for t in IndexType], default="l2")
    ap.add_argument("--dnn-model", default="resnet50")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=5000)
    ap.add_argument("--resize-size", type=int, default=224)
    ap.add_argument("--torch-weights", type=Path, default=None,
                    help="torchvision ResNet/DenseNet .pth to import as the "
                         "backbone (must match the indexer's)")
    ap.add_argument("--micro-batch", nargs="?", const="on", default="off",
                    choices=["off", "on", "auto"],
                    help="batch concurrent queries into one device call; "
                         "'auto' measures at prewarm whether coalescing "
                         "beats pipelined independent dispatches on this "
                         "host and decides from the numbers (bare "
                         "--micro-batch = 'on')")
    ap.add_argument("--no-prewarm", action="store_true",
                    help="skip the startup compile of the serving path "
                         "(use when the persistent compilation cache is "
                         "already warm; first query compiles otherwise)")
    from image_search_engine_tpu.utils.cli import (add_scaleout_args,
                                                   apply_scaleout_args)

    add_scaleout_args(ap, verb="serve")
    a = ap.parse_args(argv)
    from image_search_engine_tpu.config import DnnModel

    return Config(
        artifacts_dir=a.artifacts_dir, method=Method(a.method),
        index_type=IndexType(a.index_type), dnn_model=DnnModel(a.dnn_model),
        host=a.host, port=a.port, resize_size=a.resize_size,
        micro_batch=a.micro_batch, torch_weights=a.torch_weights,
        prewarm=not a.no_prewarm, **apply_scaleout_args(a),
    )


def cli_main(argv=None) -> None:
    """Console-script entry point (``ise-serve``) and ``python -m`` body."""
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(name)s %(message)s")
    serve(parse_args(argv))


if __name__ == "__main__":
    cli_main()
