"""End-to-end: synthetic image folder -> indexer -> engine -> HTTP query
(the reference's full indexer.py + engine.py flow, SURVEY.md §3.1-3.3)."""

import json
import threading
import urllib.request
from http.server import ThreadingHTTPServer
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

from image_search_engine_tpu.config import Config, CornerDescriptorKind, DnnModel, IndexType, Method
from image_search_engine_tpu.engine import QueryEngine, make_handler
from image_search_engine_tpu.indexer import main as indexer_main


def make_corpus(root: Path, rng, groups=3, per_group=4, size=64):
    """Groups of visually similar images: smooth structure (low-res random
    pattern upsampled) so features are stable under host-vs-device
    resampling, plus per-image noise."""
    root.mkdir(parents=True, exist_ok=True)
    paths = []
    for g in range(groups):
        low = rng.random((8, 8, 3)) * 0.6 + 0.2
        base = np.asarray(Image.fromarray((low * 255).astype(np.uint8)).resize((size, size), Image.BILINEAR), np.float32) / 255.0
        base[:, : size // 2] *= [1.0, 0.3, 0.3] if g == 0 else ([0.3, 1.0, 0.3] if g == 1 else [0.3, 0.3, 1.0])
        for i in range(per_group):
            img = np.clip(base + 0.02 * rng.standard_normal((size, size, 3)), 0, 1)
            p = root / f"g{g}_{i}.png"
            Image.fromarray((img * 255).astype(np.uint8)).save(p)
            paths.append(p)
    return paths


@pytest.fixture
def corpus_dir(tmp_path, rng):
    make_corpus(tmp_path / "images", rng)
    return tmp_path


def _cfg(corpus_dir, **kw) -> Config:
    kw.setdefault("resize_size", 32)
    return Config(
        data_dir=corpus_dir / "images",
        artifacts_dir=corpus_dir / "artifacts",
        embed_batch_size=4,
        num_images_to_return=5,
        **kw,
    )


def test_dnn_index_and_query(corpus_dir, rng):
    cfg = _cfg(corpus_dir, method=Method.DNN, dnn_model=DnnModel.RESNET_TINY,
               index_type=IndexType.L2)
    indexer_main(cfg)
    assert cfg.dnn_index_path.exists() and cfg.paths_file.exists()

    engine = QueryEngine(cfg)
    # query with a corpus image: it must return itself first at ~0 distance
    from image_search_engine_tpu.utils.imageio import load_image

    img = load_image(engine.paths[0])
    pred = engine.query(img, k=3)
    assert len(pred) == 3
    assert pred[0][2] == engine.paths[0]
    assert pred[0][0] < 0.05  # tiny host-vs-device resample difference
    assert pred[0][1]  # thumbnail present


def test_dnn_index_and_query_bf16_store(corpus_dir):
    # --store-dtype bf16: the engine reads the precision back from the
    # saved index; self-query must still return the query image first
    cfg = _cfg(corpus_dir, method=Method.DNN, dnn_model=DnnModel.RESNET_TINY,
               index_type=IndexType.L2, store_dtype="bf16")
    indexer_main(cfg)
    engine = QueryEngine(cfg)
    assert engine.index.dtype == "bf16"
    from image_search_engine_tpu.utils.imageio import load_image

    img = load_image(engine.paths[0])
    pred = engine.query(img, k=3)
    assert pred[0][2] == engine.paths[0]
    assert pred[0][0] < 0.05


def test_dnn_index_and_query_int8_store(corpus_dir):
    cfg = _cfg(corpus_dir, method=Method.DNN, dnn_model=DnnModel.RESNET_TINY,
               index_type=IndexType.COSINE, store_dtype="int8")
    indexer_main(cfg)
    engine = QueryEngine(cfg)
    assert engine.index.dtype == "int8"
    from image_search_engine_tpu.utils.imageio import load_image

    img = load_image(engine.paths[2])
    pred = engine.query(img, k=4)
    # cosine, descending: self-similarity ~1 even through int8 rounding
    assert pred[0][2] == engine.paths[2]
    assert pred[0][0] > 0.98


def test_bovw_index_and_query(corpus_dir):
    cfg = _cfg(corpus_dir, method=Method.BOVW,
               corner_descriptor=CornerDescriptorKind.DAISY,
               index_type=IndexType.COSINE, num_clusters=16,
               resize_size=96, daisy_step=16, daisy_radius=16)
    indexer_main(cfg)
    assert cfg.bovw_pipeline_path.exists() and cfg.bovw_index_path.exists()

    engine = QueryEngine(cfg)
    from image_search_engine_tpu.utils.imageio import load_image

    img = load_image(engine.paths[2])  # g0_2
    pred = engine.query(img, k=4)
    # within-group histograms can tie exactly, so assert group-level wins:
    # all top-4 hits are the query's own group, self among them
    names = [Path(p).name for _, _, p in pred]
    assert all(n.startswith("g0_") for n in names), names
    assert Path(engine.paths[2]).name in names


@pytest.mark.parametrize("kind,kw", [
    (CornerDescriptorKind.DAISY, dict(daisy_step=16, daisy_radius=16)),
    (CornerDescriptorKind.ORB, dict(max_descriptors_per_image=32)),
])
def test_bovw_fused_query_matches_generic_chain(corpus_dir, kind, kw):
    """The engine's one-dispatch fused BoVW program (describe -> quantize
    -> histogram -> BM25 -> top-k) must produce the same ranking as the
    explicit stage-by-stage chain it replaced."""
    cfg = _cfg(corpus_dir, method=Method.BOVW, corner_descriptor=kind,
               index_type=IndexType.COSINE, num_clusters=16,
               resize_size=96, **kw)
    indexer_main(cfg)
    engine = QueryEngine(cfg, prewarm=False)

    from image_search_engine_tpu.bovw.pipeline import BoVWPipeline
    from image_search_engine_tpu.descriptors import make_descriptor
    from image_search_engine_tpu.engine import _resize_host
    from image_search_engine_tpu.index.flat import FlatIndex
    from image_search_engine_tpu.utils.imageio import load_image

    pipeline = BoVWPipeline.load(cfg.bovw_pipeline_path)
    descriptor = make_descriptor(cfg)
    index = FlatIndex.load(cfg.bovw_index_path)

    for p in engine.paths[:3]:
        img = load_image(p)
        d_f, i_f = engine._search(img, 5)
        feats, valid = descriptor.describe_batch(
            _resize_host(img, cfg.resize_size)[None])
        hist = pipeline.transform(feats, valid)
        d_g, i_g = index.search(hist.astype(np.float32), 5)
        # same candidate sets; distances equal where ids agree (histogram
        # near-ties may swap order between accumulation schemes)
        assert set(i_f[0].tolist()) == set(i_g[0].tolist()), (i_f, i_g)
        np.testing.assert_allclose(np.sort(d_f[0]), np.sort(d_g[0]),
                                   rtol=1e-4, atol=1e-5)


def test_dnn_chi2_fused_query(corpus_dir):
    """chi2 is a first-class fused family (VERDICT r4 weak #4): a DNN
    chi2 index must serve through ONE fused program (no staged fallback)
    and self-query must return the query image first at ~0 distance."""
    cfg = _cfg(corpus_dir, method=Method.DNN, dnn_model=DnnModel.RESNET_TINY,
               index_type=IndexType.CHI2)
    indexer_main(cfg)
    engine = QueryEngine(cfg, prewarm=False)
    # fused path taken (the family map covers chi2), not the staged fallback
    assert engine._dnn_family(engine.index) is not None
    assert engine.index.metric == "chi2"
    from image_search_engine_tpu.utils.imageio import load_image

    img = load_image(engine.paths[1])
    d, i = engine._search(img, 4)
    assert i[0][0] == 1, (d, i)
    assert d[0][0] < 1e-3 and (np.diff(d[0]) >= 0).all(), d


def test_dnn_chi2_fused_matches_index_search(corpus_dir):
    """The fused chi2 program must rank exactly like the staged
    embed -> FlatIndex.search chain it replaced (the fused-vs-generic
    parity pattern, chi2 variant)."""
    cfg = _cfg(corpus_dir, method=Method.DNN, dnn_model=DnnModel.RESNET_TINY,
               index_type=IndexType.CHI2)
    indexer_main(cfg)
    engine = QueryEngine(cfg, prewarm=False)

    from image_search_engine_tpu.engine import _resize_host
    from image_search_engine_tpu.index.flat import FlatIndex
    from image_search_engine_tpu.models.embedder import CNNEmbedder
    from image_search_engine_tpu.utils.imageio import load_image

    index = FlatIndex.load(cfg.dnn_index_path)
    embedder = CNNEmbedder("resnet-tiny", image_size=cfg.resize_size,
                           batch_size=1)
    for p in engine.paths[:3]:
        img = load_image(p)
        d_f, i_f = engine._search(img, 5)
        feat = embedder.embed_batch(_resize_host(img, cfg.resize_size)[None])
        d_g, i_g = index.search(feat, 5)
        assert set(i_f[0].tolist()) == set(i_g[0].tolist()), (i_f, i_g)
        np.testing.assert_allclose(np.sort(d_f[0]), np.sort(d_g[0]),
                                   rtol=1e-4, atol=1e-5)


def test_bovw_chi2_fused_query_matches_generic_chain(corpus_dir):
    """BoVW over chi2 histograms serves fused too (the last staged
    fallback, engine.py chi2 exclusions, is gone)."""
    cfg = _cfg(corpus_dir, method=Method.BOVW,
               corner_descriptor=CornerDescriptorKind.DAISY,
               index_type=IndexType.CHI2, num_clusters=16,
               resize_size=96, daisy_step=16, daisy_radius=16)
    indexer_main(cfg)
    engine = QueryEngine(cfg, prewarm=False)
    assert engine.index.metric == "chi2"

    from image_search_engine_tpu.bovw.pipeline import BoVWPipeline
    from image_search_engine_tpu.descriptors import make_descriptor
    from image_search_engine_tpu.engine import _resize_host
    from image_search_engine_tpu.index.flat import FlatIndex
    from image_search_engine_tpu.utils.imageio import load_image

    pipeline = BoVWPipeline.load(cfg.bovw_pipeline_path)
    descriptor = make_descriptor(cfg)
    index = FlatIndex.load(cfg.bovw_index_path)

    for p in engine.paths[:3]:
        img = load_image(p)
        d_f, i_f = engine._search(img, 5)
        feats, valid = descriptor.describe_batch(
            _resize_host(img, cfg.resize_size)[None])
        hist = pipeline.transform(feats, valid)
        d_g, i_g = index.search(hist.astype(np.float32), 5)
        assert set(i_f[0].tolist()) == set(i_g[0].tolist()), (i_f, i_g)
        np.testing.assert_allclose(np.sort(d_f[0]), np.sort(d_g[0]),
                                   rtol=1e-4, atol=1e-5)


def test_prewarm_wide_margin_compiles_escalation_program(corpus_dir):
    """--prewarm-wide-margin: prewarm also dispatches the WIDE-margin
    program (t_margin is static => a separate compile), so the first
    real escalation doesn't recompile in the request path (ADVICE r4)."""
    import jax

    from image_search_engine_tpu.serving.fused import WIDE_MARGIN

    cfg = _cfg(corpus_dir, method=Method.DNN, dnn_model=DnnModel.RESNET_TINY,
               index_type=IndexType.L2, prewarm_wide=True)
    indexer_main(cfg)
    engine = QueryEngine(cfg, prewarm=True)
    assert engine._fused_dispatch is not None
    dummy = np.zeros((cfg.resize_size, cfg.resize_size, 3), np.float32)
    d, i, cert = jax.device_get(
        engine._fused_dispatch(dummy[None], 3, WIDE_MARGIN))
    assert np.asarray(cert).all() and np.asarray(i).shape[1] == 3


def test_dhash_index_and_query(corpus_dir):
    cfg = _cfg(corpus_dir, method=Method.DHASH)
    indexer_main(cfg)
    engine = QueryEngine(cfg)
    from image_search_engine_tpu.utils.imageio import load_image

    img = load_image(engine.paths[1])
    pred = engine.query(img, k=3)
    assert pred[0][2] == engine.paths[1]
    assert pred[0][0] == 0  # identical hash


def test_http_contract(corpus_dir):
    cfg = _cfg(corpus_dir, method=Method.DNN, dnn_model=DnnModel.RESNET_TINY)
    indexer_main(cfg)
    engine = QueryEngine(cfg)
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(engine))
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        # healthz
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/healthz") as r:
            assert json.load(r)["corpus"] == 12

        # multipart upload (the reference frontend's FormData POST, App.js:14-19)
        img_bytes = Path(engine.paths[0]).read_bytes()
        boundary = "testboundary42"
        body = (
            f"--{boundary}\r\n"
            'Content-Disposition: form-data; name="image"; filename="q.png"\r\n'
            "Content-Type: image/png\r\n\r\n"
        ).encode() + img_bytes + f"\r\n--{boundary}--\r\n".encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/similar_images",
            data=body,
            headers={"Content-Type": f"multipart/form-data; boundary={boundary}"},
        )
        with urllib.request.urlopen(req) as r:
            js = json.load(r)
        assert "prediction" in js and len(js["prediction"]) == 5
        dist, thumb, path = js["prediction"][0]
        assert path == engine.paths[0] and dist < 0.05 and thumb

        # serving stats recorded the query
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/stats") as r:
            stats = json.load(r)
        assert stats["requests"] >= 1 and stats["latency_ms_p50"] is not None

        # 400 on missing upload (reference engine.py:72-73)
        req = urllib.request.Request(f"http://127.0.0.1:{port}/similar_images", data=b"")
        try:
            urllib.request.urlopen(req)
            raise AssertionError("expected 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400

        # UI only at /; unknown GET paths are 404. The page served is the
        # PACKAGED frontend/index.html (single source of truth — its status
        # element distinguishes it from the inline fallback copy).
        from importlib import resources

        packaged = (
            resources.files("image_search_engine_tpu.frontend")
            .joinpath("index.html").read_text(encoding="utf-8")
        )
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/") as r:
            page = r.read().decode("utf-8")
        assert page == packaged and 'id="status"' in page
        try:
            urllib.request.urlopen(f"http://127.0.0.1:{port}/nope")
            raise AssertionError("expected 404")
        except urllib.error.HTTPError as e:
            assert e.code == 404
    finally:
        httpd.shutdown()


def test_micro_batched_engine_concurrent_queries(corpus_dir):
    import concurrent.futures as cf

    from image_search_engine_tpu.utils.imageio import load_image

    cfg = _cfg(corpus_dir, method=Method.DNN, dnn_model=DnnModel.RESNET_TINY,
               micro_batch=True, micro_batch_wait_ms=20.0)
    indexer_main(cfg)
    engine = QueryEngine(cfg)

    def one(i):
        img = load_image(engine.paths[i])
        return i, engine.query(img, k=3)

    with cf.ThreadPoolExecutor(6) as pool:
        results = list(pool.map(one, range(6)))
    for i, pred in results:
        assert len(pred) == 3
        assert pred[0][2] == engine.paths[i]  # each rider got ITS OWN result
        assert pred[0][0] < 0.05


def test_micro_batch_auto_calibrates_at_prewarm(corpus_dir, monkeypatch):
    # --micro-batch auto routes by MEASUREMENT: prewarm times pipelined
    # independent dispatches vs one coalesced batch and flips the batcher
    # only when coalescing wins (>10%). Both decisions must serve
    # correctly — the fused program underneath is identical.
    from image_search_engine_tpu.serving import batching
    from image_search_engine_tpu.utils.imageio import load_image

    cfg = _cfg(corpus_dir, method=Method.DNN, dnn_model=DnnModel.RESNET_TINY,
               micro_batch="auto", micro_batch_wait_ms=20.0)
    indexer_main(cfg)

    seen = {}

    def pays_5x(batched_search, image_shape, k, max_batch, reps=3):
        seen["args"] = (image_shape, k, max_batch)
        # drive the real program once so a broken fused path still fails here
        batched_search(np.zeros((1, *image_shape), np.float32), k)
        return 10.0, 2.0

    monkeypatch.setattr(batching, "measure_micro_batch_gain", pays_5x)
    engine = QueryEngine(cfg)
    assert engine._use_batcher is True
    assert seen["args"] == ((32, 32, 3), 5, cfg.micro_batch_max)
    pred = engine.query(load_image(engine.paths[0]), k=3)
    assert pred[0][2] == engine.paths[0]

    monkeypatch.setattr(
        batching, "measure_micro_batch_gain", lambda *a, **kw: (5.0, 5.0))
    engine2 = QueryEngine(cfg)
    assert engine2._use_batcher is False  # tie -> simpler per-request path
    pred = engine2.query(load_image(engine2.paths[1]), k=3)
    assert pred[0][2] == engine2.paths[1]


@pytest.mark.parametrize("kw,strict", [
    (dict(method=Method.DNN, dnn_model=DnnModel.RESNET_TINY,
          index_type=IndexType.CELL_PROBE, ivf_nlist=4, ivf_nprobe=4), True),
    (dict(method=Method.DNN, dnn_model=DnnModel.RESNET_TINY,
          index_type=IndexType.IVFPQ, ivf_nlist=2, ivf_nprobe=2, pq_m=8,
          pq_rerank=8), True),
    (dict(method=Method.BOVW, corner_descriptor=CornerDescriptorKind.DAISY,
          index_type=IndexType.COSINE, num_clusters=16, resize_size=96,
          daisy_step=16, daisy_radius=16), False),
])
def test_micro_batched_all_families(corpus_dir, kw, strict):
    """--micro-batch now routes EVERY fused family through the
    MicroBatcher (round 3 had it on flat only): concurrent riders on the
    IVF / IVFPQ-rerank / BoVW programs must each get their own result."""
    import concurrent.futures as cf

    from image_search_engine_tpu.utils.imageio import load_image

    cfg = _cfg(corpus_dir, micro_batch=True, micro_batch_wait_ms=20.0, **kw)
    indexer_main(cfg)
    engine = QueryEngine(cfg)
    assert engine._use_batcher  # mode "on": routed through the batcher

    def one(i):
        img = load_image(engine.paths[i])
        return i, engine.query(img, k=3)

    with cf.ThreadPoolExecutor(4) as pool:
        results = list(pool.map(one, range(4)))
    for i, pred in results:
        assert len(pred) == 3
        if strict:  # exact families: each rider got ITS OWN self-match
            assert pred[0][2] == engine.paths[i]
            assert pred[0][0] < 0.05
        else:  # BoVW histogram near-ties: assert group-level correctness
            g = Path(engine.paths[i]).name.split("_")[0]
            assert Path(pred[0][2]).name.startswith(g)


def test_sharded_engine_bovw_fused(corpus_dir):
    # engine + mesh + BoVW: the describe->quantize->histogram->BM25
    # prologue AND the shard_map'd distributed top-k run in ONE jitted
    # program (round 3 fell back to the staged host-hop chain on a mesh);
    # parity vs the unsharded index on the same artifact
    from image_search_engine_tpu.index.flat import FlatIndex
    from image_search_engine_tpu.parallel.mesh import make_mesh
    from image_search_engine_tpu.utils.imageio import load_image

    mesh = make_mesh(8)
    cfg = _cfg(corpus_dir, method=Method.BOVW,
               corner_descriptor=CornerDescriptorKind.DAISY,
               index_type=IndexType.COSINE, num_clusters=16,
               resize_size=96, daisy_step=16, daisy_radius=16)
    indexer_main(cfg)
    engine = QueryEngine(cfg, prewarm=False, mesh=mesh)
    assert engine.index.mesh is not None

    from image_search_engine_tpu.bovw.pipeline import BoVWPipeline
    from image_search_engine_tpu.descriptors import make_descriptor
    from image_search_engine_tpu.engine import _resize_host

    pipeline = BoVWPipeline.load(cfg.bovw_pipeline_path)
    descriptor = make_descriptor(cfg)
    ref_index = FlatIndex.load(cfg.bovw_index_path)  # unsharded reference

    for p in engine.paths[:3]:
        img = load_image(p)
        d_f, i_f = engine._search(img, 5)
        feats, valid = descriptor.describe_batch(
            _resize_host(img, cfg.resize_size)[None])
        hist = pipeline.transform(feats, valid)
        d_g, i_g = ref_index.search(hist.astype(np.float32), 5)
        assert set(i_f[0].tolist()) == set(i_g[0].tolist()), (i_f, i_g)
        np.testing.assert_allclose(np.sort(d_f[0]), np.sort(d_g[0]),
                                   rtol=1e-4, atol=1e-5)


def test_sharded_engine_flat_fused(corpus_dir):
    # engine + mesh + flat index: embed AND the shard_map'd distributed
    # top-k run in ONE jitted program (one host transfer per query), the
    # same structure as unsharded fused serving
    from image_search_engine_tpu.index.flat import FlatIndex
    from image_search_engine_tpu.parallel.mesh import make_mesh
    from image_search_engine_tpu.utils.imageio import load_image

    mesh = make_mesh(8)
    cfg = _cfg(corpus_dir, method=Method.DNN, dnn_model=DnnModel.RESNET_TINY,
               index_type=IndexType.L2, store_dtype="bf16")
    indexer_main(cfg)
    engine = QueryEngine(cfg, mesh=mesh)
    assert isinstance(engine.index, FlatIndex)
    assert engine.index.mesh is not None

    img = load_image(engine.paths[0])
    pred = engine.query(img, k=3)
    assert pred[0][2] == engine.paths[0]
    assert pred[0][0] < 0.05


def test_sharded_engine_cell_probe(corpus_dir):
    # engine + mesh + cell-probe: serving through ShardedIVF
    from image_search_engine_tpu.parallel.mesh import make_mesh
    from image_search_engine_tpu.utils.imageio import load_image

    import jax.numpy as jnp

    mesh = make_mesh(8)
    # bf16 store: the recommended cell-probe serving config must carry
    # through the engine onto the mesh (ShardedIVF bf16 rows)
    cfg = _cfg(corpus_dir, method=Method.DNN, dnn_model=DnnModel.RESNET_TINY,
               index_type=IndexType.CELL_PROBE, ivf_nlist=4, ivf_nprobe=4,
               store_dtype="bf16")
    indexer_main(cfg)
    engine = QueryEngine(cfg, mesh=mesh)
    from image_search_engine_tpu.parallel.ivf import ShardedIVF

    assert isinstance(engine.index, ShardedIVF)
    assert engine.index.packed.dtype == jnp.bfloat16

    img = load_image(engine.paths[0])
    pred = engine.query(img, k=3)
    assert pred[0][2] == engine.paths[0]
    assert pred[0][0] < 0.05


def test_sharded_engine_ivfpq_keeps_compression(corpus_dir):
    # engine + mesh + ivfpq: serving must go through ShardedIVFPQ (packed
    # codes on the mesh), NOT a silent raw-vector rebuild (round-1 gap)
    from image_search_engine_tpu.parallel.ivf import ShardedIVFPQ
    from image_search_engine_tpu.parallel.mesh import make_mesh
    from image_search_engine_tpu.utils.imageio import load_image

    mesh = make_mesh(8)
    cfg = _cfg(corpus_dir, method=Method.DNN, dnn_model=DnnModel.RESNET_TINY,
               index_type=IndexType.IVFPQ, ivf_nlist=2, ivf_nprobe=2, pq_m=8)
    indexer_main(cfg)
    engine = QueryEngine(cfg, mesh=mesh)
    assert isinstance(engine.index, ShardedIVFPQ)

    img = load_image(engine.paths[0])
    pred = engine.query(img, k=3)
    # PQ-quantized distances: self-match should still rank its own group
    assert len(pred) == 3


def test_sharded_engine_ivfpq_rerank_survives_mesh(corpus_dir):
    # --pq-rerank artifacts carry raw vectors; loading them onto a mesh
    # must keep the exact refine stage (shard-local rescore), not silently
    # downgrade to ADC ranking
    from image_search_engine_tpu.parallel.ivf import ShardedIVFPQ
    from image_search_engine_tpu.parallel.mesh import make_mesh
    from image_search_engine_tpu.utils.imageio import load_image

    mesh = make_mesh(8)
    cfg = _cfg(corpus_dir, method=Method.DNN, dnn_model=DnnModel.RESNET_TINY,
               index_type=IndexType.IVFPQ, ivf_nlist=2, ivf_nprobe=2, pq_m=8,
               pq_rerank=8)
    indexer_main(cfg)
    engine = QueryEngine(cfg, mesh=mesh)
    assert isinstance(engine.index, ShardedIVFPQ)
    assert engine.index.rerank == 8 and engine.index.raw_rows is not None

    img = load_image(engine.paths[0])
    pred = engine.query(img, k=3)
    # reranked distances are exact over the store: the self-match must
    # rank first at ~zero distance (ADC-only PQ noise could reorder it)
    assert pred[0][2] == engine.paths[0]
    assert pred[0][0] < 0.05


def test_thumbnail_cache_built_and_served(corpus_dir):
    import base64
    import io

    from PIL import Image as PILImage

    from image_search_engine_tpu.utils.imageio import ThumbnailCache

    cfg = _cfg(corpus_dir, method=Method.DHASH)
    indexer_main(cfg)
    assert cfg.thumbnails_path.exists()

    cache = ThumbnailCache.load(cfg.thumbnails_path)
    engine = QueryEngine(cfg)
    assert engine.thumbs is not None and len(cache) == len(engine.paths)

    # cached thumbnail decodes to a real <=256px image
    blob = base64.b64decode(cache.get_b64(0))
    im = PILImage.open(io.BytesIO(blob))
    assert max(im.size) <= cfg.thumbnail_size

    # and the served prediction carries it verbatim
    from image_search_engine_tpu.utils.imageio import load_image

    pred = engine.query(load_image(engine.paths[0]), k=2)
    assert pred[0][1] == cache.get_b64(0)


def test_stale_thumbnail_cache_ignored(corpus_dir):
    from image_search_engine_tpu.utils.imageio import ThumbnailCache, load_paths_csv

    cfg = _cfg(corpus_dir, method=Method.DHASH)
    indexer_main(cfg)
    # truncate the cache to simulate an index rebuilt without thumbnails
    paths = load_paths_csv(cfg.paths_file)
    ThumbnailCache.build(paths[:-1], cfg.thumbnails_path, cfg.thumbnail_size)

    engine = QueryEngine(cfg)
    assert engine.thumbs is None  # stale cache rejected, PIL fallback
    from image_search_engine_tpu.utils.imageio import load_image

    pred = engine.query(load_image(engine.paths[0]), k=2)
    assert pred[0][1]  # thumbnail still present via fallback


def test_embedder_provenance_warns_on_mismatch(corpus_dir, caplog):
    import logging as _logging

    cfg = _cfg(corpus_dir, method=Method.DNN, dnn_model=DnnModel.RESNET_TINY,
               index_type=IndexType.L2)
    indexer_main(cfg)
    assert (cfg.artifacts_dir / "embedder.json").exists()
    # same config: no warning
    with caplog.at_level(_logging.WARNING, logger="image_search_engine_tpu.engine"):
        QueryEngine(cfg, prewarm=False)
    assert not [r for r in caplog.records if "embedder mismatch" in r.message]
    caplog.clear()
    # different resize size: warn
    cfg2 = _cfg(corpus_dir, method=Method.DNN, dnn_model=DnnModel.RESNET_TINY,
                index_type=IndexType.L2, resize_size=48)
    with caplog.at_level(_logging.WARNING, logger="image_search_engine_tpu.engine"):
        QueryEngine(cfg2, prewarm=False)
    assert [r for r in caplog.records if "embedder mismatch" in r.message]


def test_random_init_backbone_guardrail(corpus_dir, caplog):
    """The reference's DNN method is pretrained-by-default
    (backend/descriptors.py:161-172); here --method dnn without
    --torch-weights must WARN loudly at index build AND at serve startup,
    and the provenance record must say weights="random"."""
    import logging as _logging

    cfg = _cfg(corpus_dir, method=Method.DNN, dnn_model=DnnModel.RESNET_TINY,
               index_type=IndexType.L2)
    with caplog.at_level(_logging.WARNING):
        indexer_main(cfg)
    assert [r for r in caplog.records if "RANDOMLY INITIALIZED" in r.message]
    meta = json.loads((cfg.artifacts_dir / "embedder.json").read_text())
    assert meta["weights"] == "random"
    caplog.clear()
    with caplog.at_level(_logging.WARNING):
        QueryEngine(cfg, prewarm=False)
    assert [r for r in caplog.records if "RANDOMLY INITIALIZED" in r.message]


def test_torch_weights_recorded_and_no_guardrail_warning(corpus_dir, caplog):
    import logging as _logging

    import torch
    from test_torch_import import TorchResNet

    p = corpus_dir / "backbone.pth"
    torch.save(TorchResNet((1, 1, 1, 1)).state_dict(), p)
    cfg = _cfg(corpus_dir, method=Method.DNN, dnn_model=DnnModel.RESNET_TINY,
               index_type=IndexType.L2, torch_weights=p)
    with caplog.at_level(_logging.WARNING):
        indexer_main(cfg)
        QueryEngine(cfg, prewarm=False)
    assert not [r for r in caplog.records if "RANDOMLY INITIALIZED" in r.message]
    meta = json.loads((cfg.artifacts_dir / "embedder.json").read_text())
    assert meta["weights"].startswith("torch:") and len(meta["weights"]) == 70
    assert meta["torch_weights_sha256"] == meta["weights"][len("torch:"):]


def test_engine_cell_probe_unsharded_fused(corpus_dir):
    # single-process cell-probe serving goes through the fused
    # embed+probe program (one device round-trip per query)
    from image_search_engine_tpu.utils.imageio import load_image

    cfg = _cfg(corpus_dir, method=Method.DNN, dnn_model=DnnModel.RESNET_TINY,
               index_type=IndexType.CELL_PROBE, ivf_nlist=4, ivf_nprobe=4)
    indexer_main(cfg)
    engine = QueryEngine(cfg)
    img = load_image(engine.paths[0])
    pred = engine.query(img, k=3)
    assert pred[0][2] == engine.paths[0]
    assert pred[0][0] < 0.05


def test_engine_ivfpq_adc_fused_codes_only(corpus_dir):
    # default (no rerank) IVFPQ flow: artifact is codes-only, the engine
    # serves through the fused embed+PQ-scan program (resident bf16
    # reconstruction table, one device round-trip per query)
    from image_search_engine_tpu.index.ivf import IVFPQIndex
    from image_search_engine_tpu.utils.imageio import load_image

    cfg = _cfg(corpus_dir, method=Method.DNN, dnn_model=DnnModel.RESNET_TINY,
               index_type=IndexType.IVFPQ, ivf_nlist=2, ivf_nprobe=2, pq_m=8)
    indexer_main(cfg)
    with np.load(cfg.dnn_index_path) as z:
        assert "vectors" not in z.files  # compressed artifact: codes only

    engine = QueryEngine(cfg)
    assert isinstance(engine.index, IVFPQIndex)
    assert engine.index.vectors is None

    img = load_image(engine.paths[0])
    pred = engine.query(img, k=3)
    # ADC ranking: self-match on top (nprobe covers every cell here)
    assert pred[0][2] == engine.paths[0]


def test_engine_ivfpq_codes_only_rerank_warns(corpus_dir, caplog):
    # an artifact that asks for rerank but carries no raw vectors must not
    # crash serving: the engine warns once and falls back to ADC ranking
    import logging as _logging

    from image_search_engine_tpu.index.ivf import IVFPQIndex
    from image_search_engine_tpu.utils.imageio import load_image

    cfg = _cfg(corpus_dir, method=Method.DNN, dnn_model=DnnModel.RESNET_TINY,
               index_type=IndexType.IVFPQ, ivf_nlist=2, ivf_nprobe=2, pq_m=8,
               pq_rerank=8)
    indexer_main(cfg)
    # strip the raw vectors while keeping rerank in the artifact
    idx = IVFPQIndex.load(cfg.dnn_index_path)
    idx.vectors = None
    idx.save(cfg.dnn_index_path, store_raw=False)

    with caplog.at_level(_logging.WARNING, logger="image_search_engine_tpu.engine"):
        engine = QueryEngine(cfg)
    assert [r for r in caplog.records if "codes only" in r.message]
    img = load_image(engine.paths[0])
    pred = engine.query(img, k=3)
    assert pred[0][2] == engine.paths[0]


def test_engine_ivfpq_rerank_serves_exact_distances(corpus_dir):
    # --pq-rerank flow: the artifact keeps raw vectors, load restores the
    # rerank default, and served results are exact-ranked over the store
    # (the ADC shortlist is re-scored in the same dispatch)
    from image_search_engine_tpu.index.ivf import IVFPQIndex
    from image_search_engine_tpu.utils.imageio import load_image

    cfg = _cfg(corpus_dir, method=Method.DNN, dnn_model=DnnModel.RESNET_TINY,
               index_type=IndexType.IVFPQ, ivf_nlist=2, ivf_nprobe=2, pq_m=8,
               pq_rerank=8)
    indexer_main(cfg)
    with np.load(cfg.dnn_index_path) as z:
        assert "vectors" in z.files  # rerank artifact carries raw vectors

    engine = QueryEngine(cfg)
    assert isinstance(engine.index, IVFPQIndex)
    assert engine.index.rerank == 8

    img = load_image(engine.paths[0])
    pred = engine.query(img, k=3)
    assert pred[0][2] == engine.paths[0]  # exact rerank: self-match on top
    assert pred[0][0] < 0.05  # true (non-ADC) distance for the self-match


def _closure_arrays(fn, depth=2):
    """Arrays of ANY size reachable through a function's closure cells —
    recursing into closed-over functions AND into plain containers
    (tuple/list/dict), so a closed-over `index._device_arrays()` tuple
    is caught, not just a bare array. No byte threshold: the fused
    serving programs must close over NO arrays at all (at the test's
    12-image corpus the O(N) lists/norms arrays are tens of bytes; at a
    real corpus the same closure is MBs-to-GBs baked into the program)."""
    out, seen = [], set()

    def visit(owner, v, d):
        nb = getattr(v, "nbytes", None)
        if nb is not None and getattr(v, "ndim", 0) >= 1:
            out.append((getattr(owner, "__name__", "?"),
                        type(v).__name__, tuple(v.shape), int(nb)))
        elif isinstance(v, (tuple, list)):
            for item in v:
                visit(owner, item, d)
        elif isinstance(v, dict):
            for item in v.values():
                visit(owner, item, d)
        elif callable(v):
            walk(v, d - 1)

    def walk(f, d):
        if d < 0 or id(f) in seen:
            return
        seen.add(id(f))
        for cell in getattr(f, "__closure__", None) or ():
            try:
                v = cell.cell_contents
            except ValueError:  # empty cell
                continue
            visit(f, v, d)

    walk(fn, depth)
    return out


def test_closure_array_detector_positive_control():
    # The guard below is only as good as this walker — prove it flags
    # the regression shapes it exists to catch before trusting its [].
    arr = np.zeros((4, 8), np.float32)

    def direct(q):
        return q + arr

    def via_tuple():
        dev = (arr, 3, "meta")  # e.g. a captured index._device_arrays()

        def f(q):
            a, _, _ = dev
            return q + a
        return f

    def via_inner_fn():
        def helper(q):
            return q + arr

        def f(q):
            return helper(q)
        return f

    for fn in (direct, via_tuple(), via_inner_fn()):
        assert _closure_arrays(fn), f"detector missed {fn.__name__}"


def test_fused_programs_close_over_no_arrays(corpus_dir, monkeypatch):
    # jit BAKES closed-over arrays into the compiled program as constants
    # — at 1M the IVF packed table is GBs and remote compilation rejects
    # the program outright (CLAUDE.md "512 MB constant -> HTTP 413"), and
    # even MB-scale constants bloat every compile-cache entry. Every
    # index-sized array must therefore ride as a jit ARGUMENT. Spy on
    # jax.jit and inspect each fused* serving program's closure
    # (regression: fused_ivf once closed over the full packed vector
    # table + O(N) lists).
    import jax

    flagged, intercepted = [], set()
    real_jit = jax.jit

    def spy(*args, **kwargs):
        if args and callable(args[0]) and \
                getattr(args[0], "__name__", "").startswith("fused"):
            intercepted.add(args[0].__name__)
            flagged.extend(_closure_arrays(args[0]))
        return real_jit(*args, **kwargs)

    monkeypatch.setattr(jax, "jit", spy)

    from image_search_engine_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(8)
    for kw in (
        dict(index_type=IndexType.L2),
        dict(index_type=IndexType.CELL_PROBE, ivf_nlist=4, ivf_nprobe=4),
        dict(index_type=IndexType.IVFPQ, ivf_nlist=2, ivf_nprobe=2, pq_m=8),
    ):
        cfg = _cfg(corpus_dir, method=Method.DNN,
                   dnn_model=DnnModel.RESNET_TINY, **kw)
        indexer_main(cfg)
        QueryEngine(cfg, prewarm=False)
        # the mesh variants route through their own fused programs —
        # same closure rule (their per-shard tables are the LARGEST)
        QueryEngine(cfg, prewarm=False, mesh=mesh)

    # the BoVW fused program too (codebook centroids + store must ride
    # as arguments, same rule)
    cfg = _cfg(corpus_dir, method=Method.BOVW, index_type=IndexType.COSINE,
               corner_descriptor=CornerDescriptorKind.DAISY, num_clusters=8)
    indexer_main(cfg)
    QueryEngine(cfg, prewarm=False)

    # positive control: the spy must have seen all six fused serving
    # programs — if engine.py renames them or stops routing through
    # jax.jit, this guard would otherwise pass vacuously
    assert {"fused", "fused_ivf", "fused_pq", "fused_bovw",
            "fused_sharded_ivf", "fused_sharded_pq"} <= intercepted, intercepted
    assert flagged == [], f"fused programs close over arrays: {flagged}"
