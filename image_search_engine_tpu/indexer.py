"""Offline indexer CLI: corpus images -> on-disk index artifacts.

The reference's ``python indexer.py`` (backend/indexer.py:27-64) with real
CLI flags instead of config-file editing. Per method:

  * DNN   -> batched CNN embeddings -> FlatIndex (l2/ip/cosine) on disk
             (reference indexer.py:51-59, one-image-at-a-time -> batched);
  * BOVW  -> corner/DAISY descriptors -> k-means codebook -> BM25-weighted
             histograms -> FlatIndex(cosine) (reference indexer.py:33-37 +
             train_bovw_model, bag_of_visual_words.py:137-204);
  * DHASH -> 64-bit difference hashes -> bit-matrix store
             (reference indexer.py:39-49 pickled a hash->paths dict).

Artifacts: index ``.npz``, pipeline/codebook ``.npz``, ``images.csv``
id->path sidecar, optional cached descriptions.

Usage:
    python -m image_search_engine_tpu.indexer --data-dir photos/ --method dnn
"""

from __future__ import annotations

import argparse
import logging
import time
from pathlib import Path

import numpy as np

from image_search_engine_tpu.config import Config, CornerDescriptorKind, IndexType, Method
from image_search_engine_tpu.descriptors import describe_dataset, make_descriptor
from image_search_engine_tpu.index.flat import FlatIndex
from image_search_engine_tpu.utils.imageio import get_image_paths, save_paths_csv

log = logging.getLogger(__name__)

# bump when backbone geometry changes (e.g. the conv-padding fix): an index
# built under a different arch tag must be rebuilt, and the engine warns
EMBEDDER_ARCH = "conv-pad-v3"  # v3: BiT switched to HF-parity geometry
# (TF-SAME padding, GN eps 1e-5, WS eps 1e-8) and unit normalization —
# bit-50/bit-tiny embeddings moved; rebuild BiT indexes


def _torch_weights_sha(cfg: Config):
    """sha256 of the backbone checkpoint, or None for random init."""
    import hashlib

    if cfg.torch_weights is None:
        return None
    h = hashlib.sha256()
    with open(cfg.torch_weights, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def warn_if_random_backbone(cfg: Config, doing: str) -> bool:
    """Loud guardrail for the DNN method's quality parity: the reference
    is pretrained-by-default (torchvision ``resnet50(IMAGENET1K_V2)`` /
    HF ``google/bit-50``, backend/descriptors.py:161-172), so a user who
    runs ``--method dnn`` without ``--torch-weights`` here would silently
    get embeddings from a RANDOMLY INITIALIZED backbone. Returns True
    when that is about to happen (and says so at WARNING level)."""
    if cfg.method != Method.DNN or cfg.torch_weights is not None:
        return False
    log.warning(
        "%s with a RANDOMLY INITIALIZED %s backbone (no --torch-weights): "
        "embeddings carry no semantics and retrieval quality will be near "
        "chance. Pass --torch-weights <checkpoint.pth> (torchvision/HF "
        "layout, see models/torch_import.py) for the reference's "
        "pretrained-by-default behavior.",
        doing, cfg.dnn_model.value,
    )
    return True


def build_dnn_index(cfg: Config, paths, mesh=None, use_native: bool = False) -> None:
    from image_search_engine_tpu.models.embedder import CNNEmbedder

    warn_if_random_backbone(cfg, "building a DNN index")
    embedder = CNNEmbedder(
        cfg.dnn_model.value, image_size=cfg.resize_size,
        batch_size=cfg.embed_batch_size, mesh=mesh,
        torch_weights=cfg.torch_weights,
    )
    desc = make_descriptor(cfg, embedder)
    feats, _, kept = describe_dataset(
        desc, paths, image_size=cfg.resize_size, batch_size=cfg.embed_batch_size,
        use_native=use_native,
    )
    metric = {"cosine": "cosine", "l2": "l2", "chi2": "chi2",
              "cell-probe": "l2", "ivfpq": "l2"}[cfg.index_type.value]
    if cfg.index_type in (IndexType.CELL_PROBE, IndexType.IVFPQ):
        from image_search_engine_tpu.index.ivf import IVFIndex, IVFPQIndex

        if cfg.store_dtype == "int8":
            raise SystemExit("--store-dtype int8 applies to flat indexes only "
                             "(IVF tables support f32/bf16; IVFPQ is already "
                             "byte-coded)")
        if cfg.index_type == IndexType.IVFPQ:
            # the reference's actual "cell-probe" index (utils.py:311-325):
            # m sub-quantizers x 8 bits over coarse residuals
            index = IVFPQIndex(
                metric=metric, nlist=cfg.ivf_nlist, nprobe=cfg.ivf_nprobe,
                m=cfg.pq_m, mesh=mesh, rerank=cfg.pq_rerank,
            ).add(feats)
        else:
            index = IVFIndex(
                metric=metric, nlist=cfg.ivf_nlist, nprobe=cfg.ivf_nprobe,
                mesh=mesh, table_dtype=cfg.store_dtype,
            ).add(feats)
    else:
        index = FlatIndex(metric, mesh=mesh, dtype=cfg.store_dtype).add(feats)
    if cfg.index_type == IndexType.IVFPQ:
        # a rerank-enabled PQ artifact must carry the raw vectors the
        # exact-rerank stage scores against
        index.save(cfg.dnn_index_path, store_raw=cfg.pq_rerank > 0)
    else:
        index.save(cfg.dnn_index_path)
    save_paths_csv([paths[i] for i in kept], cfg.paths_file)
    _save_embedder_provenance(cfg)
    log.info("DNN index: %d vectors (%d-D) -> %s", len(kept), feats.shape[1], cfg.dnn_index_path)


def _save_embedder_provenance(cfg: Config) -> None:
    """Record what produced the stored embeddings (embedder.json) so the
    engine can detect a mismatched backbone at serve time — embeddings
    from a different weights file or geometry are a silent quality bug,
    not an error, without this."""
    import json

    sha = _torch_weights_sha(cfg)
    (cfg.artifacts_dir / "embedder.json").write_text(json.dumps({
        "model": cfg.dnn_model.value,
        "resize_size": cfg.resize_size,
        "arch": EMBEDDER_ARCH,
        # human-auditable provenance: what initialized the backbone that
        # produced the stored embeddings
        "weights": "random" if sha is None else f"torch:{sha}",
        "torch_weights_sha256": sha,
    }))


def build_bovw_index(cfg: Config, paths, mesh=None, use_native: bool = False) -> None:
    from image_search_engine_tpu.bovw.pipeline import BoVWPipeline, sweep_num_clusters

    desc = make_descriptor(cfg)
    cache = cfg.artifacts_dir / f"descriptions_{cfg.corner_descriptor.value}.npz"
    feats, valid, kept = describe_dataset(
        desc, paths, image_size=cfg.resize_size, batch_size=32, cache_path=cache,
        use_native=use_native,
    )

    n_clusters = cfg.num_clusters
    if cfg.use_cluster_grid_search:
        candidates = np.unique(
            np.linspace(cfg.min_num_clusters, cfg.max_num_clusters,
                        cfg.num_cluster_grid_points, dtype=int)
        )
        n_clusters, scores = sweep_num_clusters(
            feats, valid, candidates,
            sample_size=cfg.cluster_score_sample_size, repeats=cfg.cluster_score_repeats,
        )
        log.info("cluster sweep %s -> best k=%d", scores, n_clusters)

    pipeline = BoVWPipeline(
        n_clusters=n_clusters, kmeans_niter=cfg.kmeans_niter,
        kmeans_nredo=cfg.kmeans_nredo, kmeans_seed=cfg.kmeans_seed,
        spherical=cfg.kmeans_spherical,
        bm25_k1=cfg.bm25_k1, bm25_k2=cfg.bm25_k2, bm25_b=cfg.bm25_b,
        descriptor_kind=cfg.corner_descriptor.value,
        descriptor_params={
            "max_keypoints": cfg.max_descriptors_per_image,
            "daisy_step": cfg.daisy_step, "daisy_radius": cfg.daisy_radius,
            "resize_size": cfg.resize_size,
            "n_levels": cfg.corner_n_levels,
            "scale_step": cfg.corner_scale_step,
        },
    )
    hists = pipeline.fit_transform(feats, valid)
    pipeline.save(cfg.bovw_pipeline_path)

    metric = {"cosine": "cosine", "chi2": "chi2"}.get(cfg.index_type.value, "l2")
    index = FlatIndex(metric, mesh=mesh, dtype=cfg.store_dtype).add(hists)
    index.save(cfg.bovw_index_path)
    save_paths_csv([paths[i] for i in kept], cfg.paths_file)
    log.info("BoVW index: %d images, k=%d -> %s", len(kept), n_clusters, cfg.bovw_index_path)


def build_dhash_index(cfg: Config, paths, use_native: bool = False) -> None:
    from image_search_engine_tpu.descriptors import DHashDescriptor, describe_dataset as dd

    feats, _, kept = dd(DHashDescriptor(), paths, image_size=cfg.resize_size,
                        batch_size=64, use_native=use_native)
    np.savez_compressed(cfg.dhash_store_path, bits=feats.astype(bool))
    save_paths_csv([paths[i] for i in kept], cfg.paths_file)
    log.info("dHash store: %d hashes -> %s", len(kept), cfg.dhash_store_path)


def build_thumbnails(cfg: Config) -> None:
    """Pack result thumbnails once at index time so the serving path never
    re-opens corpus images per query (the reference re-encoded up to 20
    full images with PIL on every request, backend/engine.py:59-63)."""
    from image_search_engine_tpu.utils.imageio import ThumbnailCache, load_paths_csv

    kept_paths = load_paths_csv(cfg.paths_file)
    t0 = time.time()
    ThumbnailCache.build(kept_paths, cfg.thumbnails_path, cfg.thumbnail_size)
    log.info("thumbnail cache: %d thumbs -> %s (%.1fs)",
             len(kept_paths), cfg.thumbnails_path, time.time() - t0)


def main(cfg: Config, mesh=None, use_native: bool = False) -> None:
    t0 = time.time()
    if mesh is None:
        from image_search_engine_tpu.parallel.mesh import mesh_from_config

        mesh = mesh_from_config(cfg)  # None unless --sharded/--dcn-* asked
        if mesh is not None:
            log.info("sharded build over a %d-device mesh", mesh.devices.size)
    if mesh is not None:
        import jax

        if jax.process_count() > 1:
            # honest refusal rather than an undefined-behavior build: the
            # index build has no multi-process dispatch coordination (host
            # decode batching and artifact writes are per-process; on a
            # shared FS every process would race the same .npz). Build
            # single-host (optionally --sharded over local chips); SERVING
            # the artifact multi-host is supported (ise-serve --dcn-*,
            # serving/multihost.py).
            raise SystemExit(
                "ise-index does not support multi-host (--dcn-*) builds: "
                "build the index on one host, share the artifacts "
                "directory, then serve it multi-host with ise-serve "
                "--dcn-*.")
    cfg.artifacts_dir.mkdir(parents=True, exist_ok=True)
    paths = get_image_paths(cfg.data_dir)
    if not paths:
        raise SystemExit(f"no images found under {cfg.data_dir}")
    log.info("indexing %d images with method=%s", len(paths), cfg.method.value)
    if cfg.method == Method.DNN:
        build_dnn_index(cfg, paths, mesh, use_native)
    elif cfg.method == Method.BOVW:
        build_bovw_index(cfg, paths, mesh, use_native)
    elif cfg.method == Method.DHASH:
        build_dhash_index(cfg, paths, use_native)
    if cfg.precompute_thumbnails:
        build_thumbnails(cfg)
    log.info("index build finished in %.1fs", time.time() - t0)


def parse_args(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--data-dir", type=Path, required=True)
    ap.add_argument("--artifacts-dir", type=Path, default=Path("artifacts"))
    ap.add_argument("--method", choices=[m.value for m in Method], default="dnn")
    ap.add_argument("--index-type", choices=[t.value for t in IndexType], default="l2")
    ap.add_argument("--dnn-model", default="resnet50")
    ap.add_argument("--corner-descriptor",
                    choices=[c.value for c in CornerDescriptorKind], default="daisy")
    ap.add_argument("--num-clusters", type=int, default=200)
    ap.add_argument("--max-keypoints", type=int, default=256,
                    help="total keypoint budget across pyramid octaves")
    ap.add_argument("--corner-n-levels", type=int, default=4,
                    help="keypoint scale-pyramid depth (1 = single-scale)")
    ap.add_argument("--corner-scale-step", type=float, default=1.25)
    ap.add_argument("--cluster-grid-search", action="store_true")
    ap.add_argument("--batch-size", type=int, default=64)
    ap.add_argument("--resize-size", type=int, default=224)
    ap.add_argument("--torch-weights", type=Path, default=None,
                    help="torchvision ResNet/DenseNet .pth checkpoint to import "
                         "as the backbone (models/torch_import.py)")
    ap.add_argument("--store-dtype", choices=["f32", "bf16", "int8"], default="f32",
                    help="flat-store precision (bf16/int8: 2x/4x smaller "
                         "index, recall ~0.994/~0.978 vs f32; throughput "
                         "within ~10% across precisions)")
    ap.add_argument("--pq-rerank", type=int, default=0,
                    help="ivfpq only: exact-rerank shortlist size (0 = ADC "
                         "ranking; >0 stores raw vectors in the artifact and "
                         "re-scores the top-C ADC shortlist exactly)")
    ap.add_argument("--ivf-nlist", type=int, default=8,
                    help="cell-probe/ivfpq coarse cells (reference "
                         "ncentroids=8, utils.py:317)")
    ap.add_argument("--ivf-nprobe", type=int, default=5,
                    help="cells probed per query (reference nprobe=5, "
                         "utils.py:324)")
    ap.add_argument("--pq-m", type=int, default=16,
                    help="ivfpq subquantizers (reference m=16, utils.py:318)")
    ap.add_argument("--daisy-step", type=int, default=32,
                    help="daisy grid step (reference descriptors.py:238-254)")
    ap.add_argument("--daisy-radius", type=int, default=32)
    ap.add_argument("--native-loader", action="store_true",
                    help="decode+resize with the C++ loader (native/)")
    ap.add_argument("--no-thumbnails", action="store_true",
                    help="skip the packed thumbnail cache (thumbnails.npz)")
    from image_search_engine_tpu.utils.cli import (add_scaleout_args,
                                                   apply_scaleout_args)

    add_scaleout_args(ap, verb="build/embed")
    a = ap.parse_args(argv)
    from image_search_engine_tpu.config import DnnModel

    scaleout = apply_scaleout_args(a)
    return Config(
        data_dir=a.data_dir, artifacts_dir=a.artifacts_dir,
        method=Method(a.method), index_type=IndexType(a.index_type),
        dnn_model=DnnModel(a.dnn_model),
        corner_descriptor=CornerDescriptorKind(a.corner_descriptor),
        num_clusters=a.num_clusters, use_cluster_grid_search=a.cluster_grid_search,
        max_descriptors_per_image=a.max_keypoints,
        corner_n_levels=a.corner_n_levels, corner_scale_step=a.corner_scale_step,
        embed_batch_size=a.batch_size, resize_size=a.resize_size,
        precompute_thumbnails=not a.no_thumbnails, store_dtype=a.store_dtype,
        torch_weights=a.torch_weights, pq_rerank=a.pq_rerank,
        ivf_nlist=a.ivf_nlist, ivf_nprobe=a.ivf_nprobe, pq_m=a.pq_m,
        daisy_step=a.daisy_step, daisy_radius=a.daisy_radius, **scaleout,
    ), a.native_loader


def cli_main(argv=None) -> None:
    """Console-script entry point (``ise-index``) and ``python -m`` body."""
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(name)s %(message)s")
    cfg, use_native = parse_args(argv)
    main(cfg, use_native=use_native)


if __name__ == "__main__":
    cli_main()
