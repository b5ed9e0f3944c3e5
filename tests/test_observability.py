"""Profiling / serving-stats utilities + native-loader batching path."""

import time

import numpy as np
from PIL import Image

from image_search_engine_tpu.utils.profiling import ServingStats, StageTimer
from image_search_engine_tpu.utils.imageio import load_images_batched


def test_stage_timer():
    t = StageTimer()
    with t.stage("a"):
        time.sleep(0.01)
    with t.stage("a"):
        pass
    with t.stage("b"):
        pass
    s = t.summary()
    assert s["a"]["count"] == 2 and s["b"]["count"] == 1
    assert s["a"]["total_s"] >= 0.01


def test_serving_stats_percentiles():
    st = ServingStats()
    for ms in [1, 2, 3, 4, 100]:
        st.record(ms / 1000)
    st.record(0.5, error=True)
    snap = st.snapshot()
    assert snap["requests"] == 6 and snap["errors"] == 1
    assert snap["latency_ms_p50"] <= snap["latency_ms_p99"]
    assert snap["latency_ms_p99"] >= 99


def test_serving_stats_escalations_surface():
    # certificate escalations must be operator-visible at /stats, not
    # log-only (VERDICT r3 #8b): serving/fused.certificate_epilogue
    # records them here
    st = ServingStats()
    assert st.snapshot()["certificate_escalations"] == 0
    st.record_escalation(3)
    st.record_escalation()
    assert st.snapshot()["certificate_escalations"] == 4


def test_certificate_epilogue_escalates_and_counts():
    # the shared epilogue re-runs at the wide margin exactly when the
    # certificate fails, and counts the escalation in ServingStats
    import numpy as np

    from image_search_engine_tpu.serving.fused import (
        WIDE_MARGIN, certificate_epilogue)

    st = ServingStats()
    ep = certificate_epilogue(descending=False, stats=st)
    d = np.array([[1.0, 2.0]])
    i = np.array([[5, 6]])
    retried = {}

    def retry(t_margin=None):
        retried["margin"] = t_margin
        return np.array([[0.5, 1.0]]), np.array([[7, 8]]), np.array([True])

    # certificate ok: no retry, padded tail to k=3
    dd, ii = ep((d, i, np.array([True])), 3, retry)
    assert not retried and ii[0].tolist() == [5, 6, -1]
    assert dd[0][2] == np.inf
    # certificate fails: wide-margin retry result served, escalation counted
    dd, ii = ep((d, i, np.array([False])), 2, retry)
    assert retried["margin"] == WIDE_MARGIN
    assert ii[0].tolist() == [7, 8]
    assert st.snapshot()["certificate_escalations"] == 1


def test_certificate_epilogue_still_failing_retry_logged_and_counted(caplog):
    # ADVICE r4: the retry's certificate must not be discarded — a
    # wide-margin retry that STILL fails serves best-effort, but loudly
    # (log.error) and counted in ServingStats (a second escalation)
    import logging

    import numpy as np

    from image_search_engine_tpu.serving.fused import certificate_epilogue

    st = ServingStats()
    ep = certificate_epilogue(descending=False, stats=st)
    d = np.array([[1.0, 2.0]])
    i = np.array([[5, 6]])

    def retry(t_margin=None):
        return np.array([[0.5, 1.0]]), np.array([[7, 8]]), np.array([False])

    with caplog.at_level(logging.ERROR,
                         logger="image_search_engine_tpu.serving.fused"):
        dd, ii = ep((d, i, np.array([False])), 2, retry)
    assert ii[0].tolist() == [7, 8]  # best-effort results still served
    assert st.snapshot()["certificate_escalations"] == 2
    assert any("STILL failing" in r.message for r in caplog.records)


def test_load_images_batched_native_matches_pil(rng, tmp_path):
    from image_search_engine_tpu.utils import native_loader

    paths = []
    for i in range(5):
        a = (rng.random((40, 44, 3)) * 255).astype(np.uint8)
        p = tmp_path / f"i{i}.png"
        Image.fromarray(a).save(p)
        paths.append(p)
    (tmp_path / "bad.png").write_bytes(b"not an image")
    paths.append(tmp_path / "bad.png")

    got_pil = list(load_images_batched(paths, 4, (32, 32), use_native=False))
    kept_pil = [i for _, idx in got_pil for i in idx]
    assert kept_pil == [0, 1, 2, 3, 4]

    if native_loader.available():
        got_nat = list(load_images_batched(paths, 4, (32, 32), use_native=True))
        kept_nat = [i for _, idx in got_nat for i in idx]
        assert kept_nat == kept_pil
        # the native resize is point-sampled half-pixel bilinear
        # (cv2.INTER_LINEAR semantics); golden-check that exact formula
        raw0 = np.asarray(Image.open(paths[0]), np.float32) / 255.0

        def bilinear(src, dh, dw):
            sh, sw, _ = src.shape
            fy = (np.arange(dh) + 0.5) * sh / dh - 0.5
            fx = (np.arange(dw) + 0.5) * sw / dw - 0.5
            y0 = np.floor(fy).astype(int)
            x0 = np.floor(fx).astype(int)
            wy = (fy - y0)[:, None, None]
            wx = (fx - x0)[None, :, None]
            y0c, y1c = np.clip(y0, 0, sh - 1), np.clip(y0 + 1, 0, sh - 1)
            x0c, x1c = np.clip(x0, 0, sw - 1), np.clip(x0 + 1, 0, sw - 1)
            return (src[y0c][:, x0c] * (1 - wy) * (1 - wx)
                    + src[y0c][:, x1c] * (1 - wy) * wx
                    + src[y1c][:, x0c] * wy * (1 - wx)
                    + src[y1c][:, x1c] * wy * wx)

        want0 = bilinear(raw0, 32, 32)
        # default dtype="u8": quantized post-resize (±0.5/255 vs the formula)
        nat0 = got_nat[0][0][0].astype(np.float32) / 255.0
        assert got_nat[0][0].dtype == np.uint8
        assert np.abs(nat0 - want0).max() < 1e-2

        got_f32 = list(load_images_batched(paths, 4, (32, 32),
                                           use_native=True, dtype="f32"))
        assert got_f32[0][0].dtype == np.float32
        assert np.abs(got_f32[0][0][0] - want0).max() < 1e-2
        # u8 and f32 routes agree to quantization error
        assert np.abs(nat0 - got_f32[0][0][0]).max() <= (0.5 / 255) + 1e-6


def test_orbax_pytree_roundtrip(rng, tmp_path):
    import jax.numpy as jnp

    from image_search_engine_tpu.utils.checkpoint import load_pytree, save_pytree

    tree = {"w": jnp.asarray(rng.standard_normal((4, 4)), jnp.float32),
            "nested": {"b": jnp.arange(3)}}
    save_pytree(tmp_path / "ckpt", tree)
    back = load_pytree(tmp_path / "ckpt", tree)
    np.testing.assert_allclose(np.asarray(back["w"]), np.asarray(tree["w"]))
    np.testing.assert_array_equal(np.asarray(back["nested"]["b"]), [0, 1, 2])


def test_orbax_manager_retention(rng, tmp_path):
    import jax.numpy as jnp

    from image_search_engine_tpu.utils.checkpoint import CheckpointManager

    mgr = CheckpointManager(tmp_path / "mgr", max_to_keep=2)
    for step in range(4):
        mgr.save(step, {"v": jnp.full((2,), float(step))})
    assert mgr.latest_step == 3
    back = mgr.restore()
    np.testing.assert_allclose(np.asarray(back["v"]), [3.0, 3.0])
    mgr.close()


def test_micro_batcher_batches_and_returns_correct_results(rng):
    import threading
    import time as _time

    from image_search_engine_tpu.serving.batching import MicroBatcher

    calls = []

    def batched_search(images, k):
        calls.append(images.shape[0])
        # "distance" = mean pixel of each image; ids = argsorted dummy
        d = images.mean(axis=(1, 2, 3))[:, None].repeat(k, 1)
        i = np.tile(np.arange(k), (images.shape[0], 1))
        _time.sleep(0.01)
        return d, i

    mb = MicroBatcher(batched_search, max_batch=8, max_wait_ms=30.0)
    imgs = rng.random((6, 4, 4, 3)).astype(np.float32)

    results = [None] * 6

    def worker(j):
        results[j] = mb.search(imgs[j], k=3)

    threads = [threading.Thread(target=worker, args=(j,)) for j in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    mb.close()

    for j in range(6):
        d, i = results[j]
        assert d.shape == (1, 3) and i.shape == (1, 3)
        np.testing.assert_allclose(d[0, 0], imgs[j].mean(), rtol=1e-5)
    # concurrency actually batched (fewer calls than requests, padded to 8)
    assert len(calls) < 6
    assert max(calls) == 8


def test_micro_batcher_single_request_stays_batch_one(rng):
    from image_search_engine_tpu.serving.batching import MicroBatcher

    sizes = []

    def fn(images, k):
        sizes.append(images.shape[0])
        return np.zeros((images.shape[0], k)), np.zeros((images.shape[0], k), np.int32)

    mb = MicroBatcher(fn, max_batch=8, max_wait_ms=1.0)
    mb.search(rng.random((4, 4, 3)).astype(np.float32), k=2)
    mb.close()
    assert sizes == [1]


def test_micro_batcher_propagates_errors(rng):
    import pytest as _pytest

    from image_search_engine_tpu.serving.batching import MicroBatcher

    def fn(images, k):
        raise RuntimeError("boom")

    mb = MicroBatcher(fn, max_batch=4, max_wait_ms=1.0)
    with _pytest.raises(RuntimeError, match="boom"):
        mb.search(rng.random((4, 4, 3)).astype(np.float32), k=2)
    mb.close()


def test_micro_batch_calibration_detects_overhead_bound_host():
    # Simulate a host whose dispatches SERIALIZE (a lock) with a large
    # fixed per-dispatch overhead — the one regime where coalescing pays
    # (BENCH_NOTES "Serving-layer scaling"): threaded B=1 calls each pay
    # the overhead; one padded batch pays it once.
    import threading
    import time as _time

    from image_search_engine_tpu.serving.batching import (
        measure_micro_batch_gain, micro_batch_pays)

    lock = threading.Lock()
    fixed_s, per_row_s = 0.030, 0.001

    def batched_search(images, k):
        with lock:
            _time.sleep(fixed_s + per_row_s * images.shape[0])
        b = images.shape[0]
        return np.zeros((b, k)), np.zeros((b, k), np.int32)

    threaded_ms, batched_ms = measure_micro_batch_gain(
        batched_search, image_shape=(4, 4, 3), k=3, max_batch=4, reps=2)
    # threaded ~ fixed + per_row = 31 ms/q; batched ~ (30 + 4)/4 = 8.5 ms/q
    assert batched_ms < threaded_ms
    assert micro_batch_pays(threaded_ms, batched_ms)


def test_micro_batch_pays_decision_rule():
    from image_search_engine_tpu.serving.batching import micro_batch_pays

    assert micro_batch_pays(10.0, 5.0)
    assert not micro_batch_pays(10.0, 9.5)  # <10% win: tie goes to simpler
    assert not micro_batch_pays(5.0, 10.0)


def test_config_micro_batch_mode_normalization():
    import pytest as _pytest

    from image_search_engine_tpu.config import Config

    assert Config().micro_batch_mode() == "off"
    assert Config(micro_batch=True).micro_batch_mode() == "on"
    assert Config(micro_batch="auto").micro_batch_mode() == "auto"
    with _pytest.raises(ValueError, match="micro_batch"):
        Config(micro_batch="bogus")
