"""--sharded / --dcn-* CLI wiring: multi-chip serving and indexing must be
launchable from the command line, not only via the library mesh= params
(BASELINE's v5e-8 serving layout is a CLI deployment, not a notebook)."""

import numpy as np
import pytest

from image_search_engine_tpu.config import Config


def test_mesh_from_config_none_by_default():
    from image_search_engine_tpu.parallel.mesh import mesh_from_config

    assert mesh_from_config(Config()) is None


def test_mesh_from_config_sharded_counts():
    from image_search_engine_tpu.parallel.mesh import mesh_from_config

    mesh = mesh_from_config(Config(shard_devices=0))  # 0 = all local
    assert mesh is not None and mesh.devices.size == 8
    assert mesh.axis_names == ("data",)
    mesh4 = mesh_from_config(Config(shard_devices=4))
    assert mesh4.devices.size == 4


def test_mesh_from_config_dcn_needs_full_trio():
    from image_search_engine_tpu.parallel.mesh import mesh_from_config

    with pytest.raises(ValueError, match="dcn-processes"):
        mesh_from_config(Config(dcn_coordinator="127.0.0.1:1234"))


def test_mesh_from_config_dcn_auto(monkeypatch):
    # 'auto' delegates to jax.distributed TPU-env autodetection (no-arg
    # init_multihost) and then meshes the global device set
    from image_search_engine_tpu.parallel import mesh as mesh_mod

    calls = []
    monkeypatch.setattr(mesh_mod, "init_multihost",
                        lambda *a: calls.append(a) or 8)
    m = mesh_mod.mesh_from_config(Config(dcn_coordinator="auto"))
    assert calls == [()]
    assert m is not None and m.devices.size == 8


def test_mesh_from_config_dcn_partial_trio_rejected():
    from image_search_engine_tpu.parallel.mesh import mesh_from_config

    # processes/process-id without a coordinator must fail loudly, not
    # silently fall through to autodetection
    with pytest.raises(ValueError, match="dcn-coordinator"):
        mesh_from_config(Config(dcn_num_processes=2, dcn_process_id=0))


def test_engine_cli_flags_map_to_config():
    from image_search_engine_tpu.engine import parse_args

    base = ["--artifacts-dir", "/tmp/nope", "--no-compile-cache"]
    cfg = parse_args(base)
    assert cfg.shard_devices is None and cfg.dcn_coordinator is None
    cfg = parse_args(base + ["--sharded"])
    assert cfg.shard_devices == 0
    cfg = parse_args(base + ["--sharded", "4"])
    assert cfg.shard_devices == 4
    cfg = parse_args(base + ["--dcn-coordinator", "h:1", "--dcn-processes",
                             "2", "--dcn-process-id", "1"])
    assert (cfg.dcn_coordinator, cfg.dcn_num_processes,
            cfg.dcn_process_id) == ("h:1", 2, 1)


def test_indexer_cli_ivf_and_daisy_flags():
    # round-4 gap: Config carried these fields but the CLI couldn't set
    # them (reference hardcodes ncentroids/nprobe/m, utils.py:311-325)
    from image_search_engine_tpu.indexer import parse_args

    cfg, _ = parse_args(
        ["--data-dir", "/tmp/nope", "--method", "dnn", "--index-type",
         "cell-probe", "--ivf-nlist", "4", "--ivf-nprobe", "3",
         "--pq-m", "8", "--daisy-step", "16", "--daisy-radius", "16",
         "--no-compile-cache"])
    assert (cfg.ivf_nlist, cfg.ivf_nprobe, cfg.pq_m) == (4, 3, 8)
    assert (cfg.daisy_step, cfg.daisy_radius) == (16, 16)
    # defaults stay at reference values
    cfg, _ = parse_args(["--data-dir", "/tmp/nope", "--no-compile-cache"])
    assert (cfg.ivf_nlist, cfg.ivf_nprobe, cfg.pq_m) == (8, 5, 16)


def test_engine_no_prewarm_flag():
    from image_search_engine_tpu.engine import parse_args

    base = ["--artifacts-dir", "/tmp/nope", "--no-compile-cache"]
    assert parse_args(base).prewarm is True
    assert parse_args(base + ["--no-prewarm"]).prewarm is False


def test_sharded_env_override(monkeypatch):
    monkeypatch.setenv("ISE_SHARDED", "4")
    assert Config.from_env().shard_devices == 4
    monkeypatch.delenv("ISE_SHARDED")
    assert Config.from_env().shard_devices is None


def test_indexer_cli_flags_map_to_config():
    from image_search_engine_tpu.indexer import parse_args

    cfg, _ = parse_args(["--data-dir", "/tmp/nope", "--no-compile-cache",
                         "--sharded", "8"])
    assert cfg.shard_devices == 8


def test_indexer_main_builds_sharded_index(tmp_path, rng):
    # cfg.shard_devices flows from main() into a mesh-sharded store
    from PIL import Image

    from image_search_engine_tpu.config import DnnModel, IndexType, Method
    from image_search_engine_tpu.indexer import main as indexer_main

    img_dir = tmp_path / "images"
    img_dir.mkdir()
    for i in range(8):
        arr = rng.integers(0, 255, (8, 8, 3), dtype=np.uint8)
        Image.fromarray(arr).resize((32, 32)).save(img_dir / f"im{i}.png")
    cfg = Config(data_dir=img_dir, artifacts_dir=tmp_path / "artifacts",
                 method=Method.DNN, dnn_model=DnnModel.RESNET_TINY,
                 index_type=IndexType.L2, resize_size=32, embed_batch_size=8,
                 shard_devices=8, precompute_thumbnails=False)
    indexer_main(cfg)
    assert cfg.dnn_index_path.exists()

    from image_search_engine_tpu.engine import QueryEngine

    engine = QueryEngine(cfg, prewarm=False)  # serve() would wire the mesh;
    # QueryEngine itself loads unsharded from the same artifact
    assert len(engine.paths) == 8
