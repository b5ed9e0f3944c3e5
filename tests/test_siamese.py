"""Siamese trainer: losses vs golden math, augmentations, full training
loop (tiny backbone), checkpoint/resume, create_index + eval cross-check
(reference backend/siamese/*)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from PIL import Image

from image_search_engine_tpu.training.siamese import losses as L
from image_search_engine_tpu.training.siamese.augmentations import augment_batch
from image_search_engine_tpu.training.siamese.config import (
    SiameseConfig,
    ckpt_filename,
    extract_epoch_and_loss,
    get_best_val_loss,
    get_latest_checkpoint,
)
from image_search_engine_tpu.training.siamese.dataset import PairsGenerator
from image_search_engine_tpu.training.siamese.train import Trainer


# ---------------- losses ----------------------------------------------------


def test_triplet_loss_golden(rng):
    a = rng.standard_normal((4, 8)).astype(np.float32)
    p = rng.standard_normal((4, 8)).astype(np.float32)
    n = rng.standard_normal((4, 8)).astype(np.float32)
    got = np.asarray(L.triplet_loss(a, p, n, margin=0.5))
    want = np.maximum(((a - p) ** 2).sum(1) - ((a - n) ** 2).sum(1) + 0.5, 0.0)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_triplet_loss_zero_when_easy():
    a = np.zeros((1, 4), np.float32)
    p = np.zeros((1, 4), np.float32)
    n = np.full((1, 4), 10.0, np.float32)
    assert float(L.triplet_loss(a, p, n, 0.5)[0]) == 0.0


def test_circle_loss_golden(rng):
    # independent reimplementation of model.py:92-137
    a = rng.standard_normal((6, 16)).astype(np.float32)
    p = rng.standard_normal((6, 16)).astype(np.float32)
    n = rng.standard_normal((6, 16)).astype(np.float32)
    m, s = 0.25, 256.0

    def cos(x, y):
        x = x / np.linalg.norm(x, axis=1, keepdims=True)
        y = y / np.linalg.norm(y, axis=1, keepdims=True)
        return (x * y).sum(1)

    sp, sn = cos(a, p), cos(a, n)
    ap_ = np.maximum(1 + m - sp, 0)
    an_ = np.maximum(sn + m, 0)
    lp = -s * ap_ * (sp - (1 - m))
    ln = s * an_ * (sn - m)
    lse = lambda v: np.log(np.exp(v - v.max()).sum()) + v.max()
    x = lse(ln) + lse(lp)
    want = max(x, 0.0) + np.log1p(np.exp(-abs(x)))  # stable softplus
    got = float(L.circle_loss(a, p, n, m, s))
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_self_supervised_circle_separates(rng):
    # loss must be lower when anchors ~= positives than when random
    a = rng.standard_normal((8, 16)).astype(np.float32)
    close = a + 0.01 * rng.standard_normal((8, 16)).astype(np.float32)
    far = rng.standard_normal((8, 16)).astype(np.float32)
    assert float(L.self_supervised_circle_loss(a, close)) < float(
        L.self_supervised_circle_loss(a, far)
    )


# ---------------- augmentations ----------------------------------------------


def test_augment_batch_shape_range_and_randomness(rng):
    imgs = rng.random((4, 32, 24, 3)).astype(np.float32)
    k1, k2 = jax.random.PRNGKey(0), jax.random.PRNGKey(1)
    a1 = np.asarray(augment_batch(k1, imgs))
    a1b = np.asarray(augment_batch(k1, imgs))
    a2 = np.asarray(augment_batch(k2, imgs))
    assert a1.shape == imgs.shape
    assert a1.min() >= 0.0 and a1.max() <= 1.0
    np.testing.assert_array_equal(a1, a1b)  # deterministic per key
    assert not np.allclose(a1, a2)  # different key -> different aug
    assert not np.allclose(a1, imgs)  # actually changed


def test_augment_gating_matches_reference_probabilities():
    # the reference applies each op with its albumentations p= (0.5/0.3/
    # 0.1), NOT unconditionally (round-1 gap); gate frequencies over a
    # large batch must track those probabilities
    from image_search_engine_tpu.training.siamese.augmentations import (
        OP_PROBS, sample_gates)

    b = 4000
    gates = sample_gates(jax.random.PRNGKey(3), b)
    assert set(gates) == set(OP_PROBS)
    for name, p in OP_PROBS.items():
        freq = float(np.asarray(gates[name]).mean())
        assert abs(freq - p) < 0.04, (name, freq, p)


def test_augment_all_gates_off_is_identity(rng, monkeypatch):
    # an image whose every gate sampled False must pass through untouched
    import image_search_engine_tpu.training.siamese.augmentations as aug

    imgs = rng.random((64, 16, 16, 3)).astype(np.float32)
    key = jax.random.PRNGKey(11)
    gates = aug.sample_gates(key, 64)
    all_off = ~np.asarray(
        np.stack([np.asarray(gates[n]) for n in sorted(gates)])
    ).any(axis=0)
    if not all_off.any():
        # with 12 gated ops an all-off image is rare; force the check by
        # zeroing the probabilities (un-jitted so the new OP_PROBS applies)
        monkeypatch.setattr(
            aug, "OP_PROBS", {n: 0.0 for n in aug.OP_PROBS})
        out = np.asarray(aug.augment_batch.__wrapped__(key, jnp.asarray(imgs)))
        np.testing.assert_allclose(out, imgs, atol=1e-6)
        return
    out = np.asarray(aug.augment_batch(key, imgs))
    np.testing.assert_allclose(out[all_off], imgs[all_off], atol=1e-6)


def test_augment_ops_individually_active(rng):
    # each op, forced on alone, must change the image (guards against a
    # dead branch behind the gating)
    import image_search_engine_tpu.training.siamese.augmentations as aug

    imgs = rng.random((8, 32, 32, 3)).astype(np.float32) * 0.8 + 0.1
    key = jax.random.PRNGKey(5)
    base = {n: 0.0 for n in aug.OP_PROBS}
    for name in aug.OP_PROBS:
        probs = dict(base, **{name: 1.0})
        try:
            orig = aug.OP_PROBS
            aug.OP_PROBS = probs
            out = np.asarray(aug.augment_batch.__wrapped__(key, jnp.asarray(imgs)))
        finally:
            aug.OP_PROBS = orig
        assert not np.allclose(out, imgs, atol=1e-5), f"{name} is a no-op"


# ---------------- checkpoint names --------------------------------------------


def test_ckpt_name_roundtrip(tmp_path):
    name = ckpt_filename(7, 0.1234)
    assert extract_epoch_and_loss(name) == (7, 0.1234)
    assert extract_epoch_and_loss("garbage.msgpack") is None
    (tmp_path / ckpt_filename(1, 0.5)).write_bytes(b"x")
    (tmp_path / ckpt_filename(3, 0.4)).write_bytes(b"x")
    (tmp_path / ckpt_filename(2, 0.3)).write_bytes(b"x")
    assert get_latest_checkpoint(tmp_path).name == ckpt_filename(3, 0.4)
    assert get_best_val_loss(tmp_path) == 0.3


# ---------------- end-to-end training ------------------------------------------


@pytest.fixture
def card_corpus(tmp_path, rng):
    for split, n in [("train", 6), ("valid", 4)]:
        d = tmp_path / split
        d.mkdir()
        for i in range(n):
            low = rng.random((6, 6, 3))
            img = np.asarray(
                Image.fromarray((low * 255).astype(np.uint8)).resize((32, 32)), np.uint8
            )
            Image.fromarray(img).save(d / f"card_{i}.png")
    return tmp_path


def _tiny_cfg(root, **kw) -> SiameseConfig:
    kw.setdefault("batch_size", 4)
    return SiameseConfig(
        train_dir=root / "train", valid_dir=root / "valid",
        ckpt_dir=root / "ckpts", log_file=root / "metrics.jsonl",
        backbone="densenet-tiny", image_size=(32, 32), embedding_dim=16,
        freeze_backbone=False, **kw,
    )


@pytest.mark.parametrize("loss", ["triplet", "self_supervised_circle"])
def test_training_reduces_loss_and_checkpoints(card_corpus, loss):
    cfg = _tiny_cfg(card_corpus, loss=loss, lr=1e-2)
    tr = Trainer(cfg)
    out = tr.run(epochs=3, steps_per_epoch=4, val_steps=2)
    assert len(out["history"]) == 3
    assert np.isfinite(out["best_val"])
    assert get_latest_checkpoint(cfg.ckpt_dir) is not None
    assert cfg.log_file.exists()


def test_training_resume(card_corpus):
    cfg = _tiny_cfg(card_corpus, loss="triplet", lr=1e-2)
    tr1 = Trainer(cfg)
    tr1.run(epochs=2, steps_per_epoch=2, val_steps=1)
    latest = get_latest_checkpoint(cfg.ckpt_dir)
    assert latest is not None
    tr2 = Trainer(cfg)
    tr2.maybe_resume()
    assert tr2.start_epoch >= 1  # picks up after the saved epoch
    # resumed params match the checkpointed ones
    p1 = jax.tree_util.tree_leaves(tr1.params)
    p2 = jax.tree_util.tree_leaves(tr2.params)
    # tr1 may have advanced past the best ckpt; at least shapes align and
    # a fresh trainer's params were overwritten by load
    assert all(a.shape == b.shape for a, b in zip(p1, p2))


def test_create_index_and_eval_crosscheck(card_corpus):
    from image_search_engine_tpu.training.siamese.create_index import create_index
    from image_search_engine_tpu.training.siamese.eval import query_index, recall_at_k

    cfg = _tiny_cfg(card_corpus, loss="triplet")
    out_index = card_corpus / "siamese.index.npz"
    out_csv = card_corpus / "images.csv"
    index = create_index(cfg, card_corpus / "train", out_index, out_csv)
    assert out_index.exists() and out_csv.exists()

    manual = create_index(
        cfg, card_corpus / "train", card_corpus / "manual.npz", out_csv, manual=True
    )
    q = manual[:3]
    df, if_ = query_index(q, index, "flat", k=3)
    db, ib = query_index(q, manual, "bruteforce", k=3)
    # faiss-vs-dict cross-check (test_index.py pattern): same neighbor sets
    assert recall_at_k(if_, ib) == 1.0
    assert (if_[:, 0] == np.arange(3)).all()  # self-match first


def test_siamese_serving_http(card_corpus):
    """The trained siamese index serves over the SAME HTTP contract as
    the main engine (training/siamese/serve.py — the reference stops at
    notebook queries; here L7's output composes with L5's server):
    self-query returns itself first at ~max cosine, thumbnails ride
    along, /stats and the 400 error path hold."""
    import json
    import threading
    import urllib.request
    from http.server import ThreadingHTTPServer

    from image_search_engine_tpu.engine import make_handler
    from image_search_engine_tpu.training.siamese.create_index import create_index
    from image_search_engine_tpu.training.siamese.serve import SiameseQueryEngine

    cfg = _tiny_cfg(card_corpus, loss="triplet", lr=1e-2)
    Trainer(cfg).run(epochs=1, steps_per_epoch=2, val_steps=1)
    out_index = card_corpus / "siamese.index.npz"
    out_csv = card_corpus / "images.csv"
    create_index(cfg, card_corpus / "train", out_index, out_csv)

    engine = SiameseQueryEngine(cfg, out_index, out_csv, n_results=3,
                                prewarm=False)
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(engine))
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        img_bytes = (card_corpus / "train" / "card_2.png").read_bytes()
        boundary = "sb7"
        body = (f"--{boundary}\r\n"
                'Content-Disposition: form-data; name="image"; '
                'filename="q.png"\r\n'
                "Content-Type: image/png\r\n\r\n").encode() + img_bytes + \
            f"\r\n--{boundary}--\r\n".encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/similar_images", data=body,
            headers={"Content-Type":
                     f"multipart/form-data; boundary={boundary}"})
        with urllib.request.urlopen(req) as r:
            js = json.load(r)
        assert len(js["prediction"]) == 3
        dist, thumb, path = js["prediction"][0]
        assert path.endswith("card_2.png") and thumb
        assert dist > 0.99  # cosine self-similarity
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/stats") as r:
            assert json.load(r)["requests"] >= 1
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/similar_images", data=b"")
        try:
            urllib.request.urlopen(req)
            raise AssertionError("expected 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        httpd.shutdown()


def test_training_improves_retrieval(tmp_path):
    """The capability the whole L7 subsystem exists for (reference
    test_index.py + notebook workflow): siamese training must make
    retrieval BETTER, not just reduce loss. Single-instance-per-class card
    corpus, query photos from the training augmentation pipeline with
    held-out keys, recall@1 through the real flat-IP index path —
    trained-vs-untrained margin asserted (measured +0.45..0.58 at this
    operating point, BENCH_NOTES "Training improves retrieval"; lr 1e-4 is
    load-bearing — 1e-3 collapses the embedding, also measured)."""
    from image_search_engine_tpu.training.siamese.eval import (
        card_retrieval_metrics,
        make_synthetic_card_corpus,
    )

    cards, queries, qlabel = make_synthetic_card_corpus(32, 64, q_per=4)
    train_dir = tmp_path / "train"
    train_dir.mkdir()
    for i in range(cards.shape[0]):
        Image.fromarray((cards[i] * 255).astype(np.uint8)).save(
            train_dir / f"card_{i:03d}.png")

    cfg = SiameseConfig(
        train_dir=train_dir, valid_dir=train_dir,
        ckpt_dir=tmp_path / "ckpts", log_file=tmp_path / "m.jsonl",
        backbone="densenet-tiny", image_size=(64, 64), embedding_dim=32,
        freeze_backbone=False, loss="self_supervised_circle",
        lr=1e-4, batch_size=16,
    )
    tr = Trainer(cfg)
    embed = lambda x: tr.embed(x, batch_size=32)  # noqa: E731
    before = card_retrieval_metrics(embed, cards, queries, qlabel)
    tr.run(epochs=12, steps_per_epoch=8, val_steps=1)
    after = card_retrieval_metrics(embed, cards, queries, qlabel)
    assert after["recall_at_1"] >= before["recall_at_1"] + 0.25, (before, after)
    assert after["gap"] >= before["gap"] + 0.2, (before, after)


def test_trainer_dp_sharded_step(card_corpus):
    from image_search_engine_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(8)
    cfg = _tiny_cfg(card_corpus, loss="triplet", batch_size=8)
    tr = Trainer(cfg, mesh=mesh)
    gen = PairsGenerator.from_dir(cfg.train_dir, 8, cfg.image_size)
    out = tr.run(train_gen=gen, valid_gen=gen, epochs=1, steps_per_epoch=2, val_steps=1)
    assert np.isfinite(out["best_val"])


def test_trainer_embed_uint8_matches_f32(card_corpus, rng):
    """The corpus loader hands uint8 batches by default; Trainer.embed
    must cast on device, not feed raw [0,255] into the backbone."""
    tr = Trainer(_tiny_cfg(card_corpus))
    u8 = rng.integers(0, 256, (3, 32, 32, 3), dtype=np.uint8)
    a = tr.embed(u8, batch_size=4)
    b = tr.embed(u8.astype(np.float32) / 255.0, batch_size=4)
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_compute_dtype_bf16_parity_and_f32_state(card_corpus, rng):
    """compute_dtype="bf16" (the default) changes only the forward/backward
    compute precision: params/opt-state stay f32, the loss stays f32 and
    tracks the f32-compute loss, and one train step moves the params."""
    import jax.random as jrandom

    a = rng.random((4, 32, 32, 3)).astype(np.float32)
    n = rng.random((4, 32, 32, 3)).astype(np.float32)
    losses = {}
    for cd in ("bf16", "f32"):
        cfg = _tiny_cfg(card_corpus, loss="triplet", compute_dtype=cd)
        tr = Trainer(cfg)
        assert all(l.dtype == np.float32
                   for l in jax.tree_util.tree_leaves(tr.params))
        p, bs, opt, loss = tr._train_step(
            tr.params, tr.batch_stats, tr.opt_state, jrandom.PRNGKey(0),
            jnp.asarray(a), jnp.asarray(n))
        assert loss.dtype == jnp.float32
        assert all(l.dtype == np.float32 for l in jax.tree_util.tree_leaves(p))
        losses[cd] = float(loss)
    # same init (same seed) -> bf16 compute tracks the f32 loss closely
    assert np.isfinite(losses["bf16"]) and np.isfinite(losses["f32"])
    assert abs(losses["bf16"] - losses["f32"]) < 0.05 * (abs(losses["f32"]) + 1.0)


def test_compute_dtype_rejects_unknown(card_corpus):
    with pytest.raises(ValueError, match="compute_dtype"):
        _tiny_cfg(card_corpus, compute_dtype="fp8")


def test_prefetcher_order_errors_and_stop():
    from image_search_engine_tpu.training.siamese.train import Prefetcher

    # order-preserving and exhaustion-safe
    pf = Prefetcher(iter(range(10)), depth=2)
    assert list(pf) == list(range(10))

    # an iterator error surfaces at the consumer, not in the thread
    def boom():
        yield 1
        raise RuntimeError("decode failed")

    pf = Prefetcher(boom(), depth=2)
    assert next(pf) == 1
    with pytest.raises(RuntimeError, match="decode failed"):
        next(pf)

    # stop() unblocks a producer parked on a full queue (no hang)
    import itertools
    pf = Prefetcher(itertools.count(), depth=1)
    assert next(pf) == 0
    pf.stop()
    pf._thread.join(timeout=5.0)
    assert not pf._thread.is_alive()

    # the end-of-iterator sentinel put is ALSO stop-safe: a finite
    # iterator whose sentinel can't fit in the full queue must not
    # strand the thread after stop() (regression: the sentinel/error
    # puts used to block unboundedly)
    pf = Prefetcher(iter([1]), depth=1)
    import time as _time
    _time.sleep(0.1)  # item 1 fills the depth-1 queue; the sentinel parks
    pf.stop()
    pf._thread.join(timeout=5.0)
    assert not pf._thread.is_alive()


def test_average_meter_accepts_device_scalars():
    from image_search_engine_tpu.training.siamese.train import AverageMeter

    m = AverageMeter()
    m.update(jnp.asarray(2.0))
    m.update(jnp.asarray(4.0), n=3)
    assert isinstance(m.avg, float)
    assert abs(m.avg - (2.0 + 12.0) / 4) < 1e-6
    # plain floats still work (reference semantics)
    m2 = AverageMeter()
    m2.update(1.0)
    assert m2.avg == 1.0


def test_train_step_uint8_matches_f32(card_corpus, rng):
    """Training batches travel uint8 (4x lighter uploads) and cast to
    [0,1] f32 on device — one step from the same init must produce the
    same loss either way (CLAUDE.md uint8-transfer invariant)."""
    import jax.random as jrandom

    a8 = (rng.random((4, 32, 32, 3)) * 255).astype(np.uint8)
    n8 = (rng.random((4, 32, 32, 3)) * 255).astype(np.uint8)
    losses = []
    for batches in ((a8, n8), (a8.astype(np.float32) / 255.0,
                               n8.astype(np.float32) / 255.0)):
        tr = Trainer(_tiny_cfg(card_corpus, loss="triplet"))  # same seed/init
        _, _, _, loss = tr._train_step(
            tr.params, tr.batch_stats, tr.opt_state, jrandom.PRNGKey(0),
            jnp.asarray(batches[0]), jnp.asarray(batches[1]))
        losses.append(float(loss))
    assert abs(losses[0] - losses[1]) < 1e-6 * (abs(losses[1]) + 1.0)


def test_pairs_generator_yields_uint8(card_corpus):
    from image_search_engine_tpu.training.siamese.dataset import PairsGenerator

    gen = PairsGenerator.from_dir(card_corpus / "train", 2, (32, 32))
    anchors, negatives = next(iter(gen))
    assert anchors.dtype == np.uint8 and negatives.dtype == np.uint8
    assert anchors.shape == (2, 32, 32, 3)
