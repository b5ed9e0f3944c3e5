"""The reference's siamese training workflow, composed END-TO-END on the
chip at reference geometry (VERDICT r3 missing #1).

The reference's L7 story (siamese_tf/train.py:136-144 +
create_index.py:88-100 + test_index.py:49-71, driven by Siamese.ipynb
cells 11-15): train DenseNet121 on a folder of single-instance-class card
images, build a 128-D cosine index from the checkpoint, query it. Every
piece of that is pinned separately by tests/benchmarks; this script runs
the WHOLE chain once, on the TPU, at reference geometry:

  1. write a few-hundred-card synthetic corpus (352x256 PNGs on disk,
     train/valid split — the Magic-card single-instance-per-class setting,
     reference dataset.py:77-105);
  2. measure UNTRAINED retrieval (random init — pretrained torchvision
     weights are unavailable in this environment, BENCH_NOTES "Real
     pretrained weights");
  3. train phase A on the chip (DenseNet121 unfrozen, circle loss,
     lr 1e-4 — the recipe pinned by benchmarks/training_value.py);
  4. STOP, then resume from the latest epoch checkpoint in a FRESH
     Trainer (the reference's restart-the-script resume,
     siamese_tf/train.py:81-101) and train phase B;
  5. create_index from the trained checkpoint (batched TPU embed,
     flat-IP + images.csv);
  6. measure TRAINED retrieval (same corpus, augmented query photos,
     held-out keys) — the trained-vs-untrained table;
  7. serve the trained index over real HTTP and query it with an
     augmented card photo; record the served latency and whether the
     true card ranked first.

    python benchmarks/siamese_e2e_chip.py [--cards 224] [--epochs-a 8]
"""

from __future__ import annotations

import argparse
import io
import json
import shutil
import sys
import threading
import time
import urllib.request
from http.server import ThreadingHTTPServer
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def build_corpus(n_train, n_valid, h, w, workdir):
    """Sharp random block-pattern "cards" at (h, w) — the non-square
    sibling of eval.make_synthetic_card_corpus — written to disk as the
    train/valid PNG folders the reference trainer consumes."""
    from PIL import Image

    rng = np.random.default_rng(0)
    n = n_train + n_valid
    base = (rng.random((n, 11, 8, 3)) > 0.5).astype(np.float32)
    base = base * (0.3 + 0.7 * rng.random((n, 11, 8, 3)).astype(np.float32))
    # exact integer nearest-upsample in numpy (no TPU compile for corpus
    # generation — a remote resize compile cost ~10 min of a chip run)
    assert h % 11 == 0 and w % 8 == 0, "card grid must divide (h, w)"
    cards = np.repeat(np.repeat(base, h // 11, axis=1), w // 8, axis=2)
    shutil.rmtree(workdir, ignore_errors=True)
    (workdir / "train").mkdir(parents=True)
    (workdir / "valid").mkdir(parents=True)
    for i in range(n_train):
        Image.fromarray((cards[i] * 255).astype(np.uint8)).save(
            workdir / "train" / f"card_{i:03d}.png")
    for i in range(n_valid):
        Image.fromarray((cards[n_train + i] * 255).astype(np.uint8)).save(
            workdir / "valid" / f"vcard_{i:03d}.png")
    # uint8 in RAM (halves footprint; embed casts on device)
    return (cards[:n_train] * 255).astype(np.uint8)


def make_queries(cards_u8, q_per):
    """Augmented "photos" of each train card via the TRAINING augmentation
    pipeline at held-out keys (reference: queries are photos of the one
    canonical card image)."""
    import jax

    from image_search_engine_tpu.training.siamese.augmentations import augment_batch

    n = cards_u8.shape[0]
    chunks, labels = [], []
    b = 32
    for rep in range(q_per):
        for s in range(0, n, b):
            blk = cards_u8[s : s + b].astype(np.float32) / 255.0
            pad = b - blk.shape[0]
            if pad:
                blk = np.concatenate([blk, np.zeros((pad,) + blk.shape[1:],
                                                    np.float32)])
            out = np.asarray(augment_batch(
                jax.random.PRNGKey(881_000 + rep * 1000 + s), blk))
            chunks.append((np.clip(out[: b - pad if pad else b], 0, 1)
                           * 255).astype(np.uint8))
            labels.append(np.arange(s, min(s + b, n), dtype=np.int32))
    return np.concatenate(chunks), np.concatenate(labels)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cards", type=int, default=224)
    ap.add_argument("--valid-cards", type=int, default=32)
    ap.add_argument("--q-per", type=int, default=2)
    ap.add_argument("--height", type=int, default=352)
    ap.add_argument("--width", type=int, default=256)
    ap.add_argument("--epochs-a", type=int, default=50)
    ap.add_argument("--epochs-b", type=int, default=50)
    ap.add_argument("--loss", default="self_supervised_circle",
                    help="circle (TF triple form) or self_supervised_circle "
                         "(the reference PT trainer's "
                         "SelfSupervisedLoss(CircleLoss), siamese_pt/"
                         "train.py:189 — the form benchmarks/"
                         "training_value.py proved moves retrieval)")
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--workdir", type=Path, default=Path("/tmp/siamese_e2e"))
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax

    # persistent compile cache: a tunnel flake mid-run (remote_compile
    # dropping the response body, observed 2026-08-20) costs a relaunch;
    # with the cache warm the relaunch skips straight past every compile
    from image_search_engine_tpu.utils.compile_cache import enable as _cc

    _cc()

    from image_search_engine_tpu.training.siamese.config import (
        SiameseConfig, extract_epoch_and_loss, get_latest_checkpoint)
    from image_search_engine_tpu.training.siamese.create_index import create_index
    from image_search_engine_tpu.training.siamese.eval import card_retrieval_metrics
    from image_search_engine_tpu.training.siamese.train import Trainer

    print(f"backend: {jax.default_backend()} devices: {jax.devices()}",
          flush=True)

    t_all = time.time()
    cards_u8 = build_corpus(args.cards, args.valid_cards, args.height,
                            args.width, args.workdir)
    print(f"[{time.time()-t_all:.0f}s] corpus written: {args.cards} train + "
          f"{args.valid_cards} valid cards at {args.height}x{args.width}",
          flush=True)
    queries_u8, qlabel = make_queries(cards_u8, args.q_per)
    print(f"[{time.time()-t_all:.0f}s] {len(qlabel)} augmented query photos",
          flush=True)

    cfg = SiameseConfig(
        train_dir=args.workdir / "train", valid_dir=args.workdir / "valid",
        ckpt_dir=args.workdir / "ckpts",
        log_file=args.workdir / "metrics.jsonl",
        backbone="densenet121", image_size=(args.height, args.width),
        embedding_dim=128, freeze_backbone=False, loss=args.loss,
        lr=1e-4, batch_size=args.batch,
    )

    trainer = Trainer(cfg)
    embed = lambda x: trainer.embed(x, batch_size=32)  # noqa: E731
    t0 = time.time()
    before = card_retrieval_metrics(embed, cards_u8, queries_u8, qlabel)
    print(f"[{time.time()-t_all:.0f}s] untrained ({time.time()-t0:.0f}s): "
          f"{json.dumps(before)}", flush=True)

    def save_final(tr, out, upto):
        """Best-val gating (reference ModelCheckpoint(save_best_only))
        saves nothing when val is still descending from a spike — but the
        composed-run demo must resume from the ACTUAL stop point and
        build the index from the ACTUAL trained weights, so save the
        final state explicitly when the gate didn't."""
        last = get_latest_checkpoint(cfg.ckpt_dir)
        last_ep = extract_epoch_and_loss(last.name)[0] if last else -1
        if last_ep < upto - 1:
            vl = out["history"][-1]["val_loss"] if out["history"] else 0.0
            tr.save_checkpoint(upto - 1, vl)

    # phase A
    t0 = time.time()
    outA = trainer.run(epochs=args.epochs_a, val_steps=1)
    save_final(trainer, outA, args.epochs_a)
    phase_a_s = time.time() - t0
    print(f"[{time.time()-t_all:.0f}s] phase A done ({phase_a_s:.0f}s): "
          f"best val {outA['best_val']:.4f}", flush=True)
    midway = card_retrieval_metrics(embed, cards_u8, queries_u8, qlabel)
    print(f"[{time.time()-t_all:.0f}s] after phase A: {json.dumps(midway)}",
          flush=True)
    del trainer

    # phase B: FRESH trainer resumes from the latest epoch checkpoint
    # (reference restart-the-script resume, siamese_tf/train.py:81-101)
    trainer = Trainer(cfg)
    embed = lambda x: trainer.embed(x, batch_size=32)  # noqa: E731
    t0 = time.time()
    resumed_from = None
    outB = trainer.run(epochs=args.epochs_a + args.epochs_b, val_steps=1)
    save_final(trainer, outB, args.epochs_a + args.epochs_b)
    phase_b_s = time.time() - t0
    resumed_from = trainer.start_epoch
    print(f"[{time.time()-t_all:.0f}s] phase B resumed at epoch "
          f"{resumed_from}, done ({phase_b_s:.0f}s): best val "
          f"{outB['best_val']:.4f}", flush=True)

    after = card_retrieval_metrics(embed, cards_u8, queries_u8, qlabel)
    print(f"[{time.time()-t_all:.0f}s] trained: {json.dumps(after)}",
          flush=True)

    # create_index from the trained checkpoint (its own Trainer, as the
    # reference's create_index script loads the checkpoint fresh)
    t0 = time.time()
    index = create_index(cfg, cfg.train_dir, args.workdir / "siamese.index.npz",
                         args.workdir / "images.csv")
    ckpt = get_latest_checkpoint(cfg.ckpt_dir)
    print(f"[{time.time()-t_all:.0f}s] index built from {ckpt.name} "
          f"({time.time()-t0:.0f}s): {index.ntotal} x {index.d}", flush=True)

    # serve one query over real HTTP: an augmented photo of card 7
    from image_search_engine_tpu.engine import make_handler
    from image_search_engine_tpu.training.siamese.serve import SiameseQueryEngine

    shim = SiameseQueryEngine(cfg, args.workdir / "siamese.index.npz",
                              args.workdir / "images.csv",
                              n_results=cfg.n_results, prewarm=False)
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(shim))
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        from PIL import Image

        q_idx = int(np.where(qlabel == 7)[0][0])
        buf = io.BytesIO()
        Image.fromarray(queries_u8[q_idx]).save(buf, format="PNG")
        boundary = "b42"
        body = (f"--{boundary}\r\n"
                'Content-Disposition: form-data; name="image"; '
                'filename="q.png"\r\n'
                "Content-Type: image/png\r\n\r\n").encode() + buf.getvalue() \
            + f"\r\n--{boundary}--\r\n".encode()
        # warm once (first served query compiles nothing new but pays the
        # resize+embed dispatch), then time
        for tag in ("warm", "timed"):
            t0 = time.time()
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/similar_images", data=body,
                headers={"Content-Type":
                         f"multipart/form-data; boundary={boundary}"})
            with urllib.request.urlopen(req) as r:
                js = json.load(r)
            served_ms = (time.time() - t0) * 1e3
            top = js["prediction"][0]
            print(f"[{time.time()-t_all:.0f}s] served query ({tag}): "
                  f"{served_ms:.0f} ms, top hit {Path(top[2]).name} "
                  f"(dist {top[0]})", flush=True)
        hit = Path(top[2]).name == "card_007.png"
    finally:
        httpd.shutdown()

    print(json.dumps({
        "metric": "siamese_e2e_trained_minus_untrained_recall_at_1",
        "value": round(after["recall_at_1"] - before["recall_at_1"], 4),
        "untrained": before, "after_phase_a": midway, "trained": after,
        "epochs": args.epochs_a + args.epochs_b,
        "resumed_from_epoch": resumed_from,
        "phase_a_s": round(phase_a_s, 1), "phase_b_s": round(phase_b_s, 1),
        "epoch_seconds": [h["seconds"] for h in
                          (outA["history"] + outB["history"])],
        "loss_trajectory": [round(h["loss"], 2) for h in
                            (outA["history"] + outB["history"])],
        "val_trajectory": [round(h["val_loss"], 2) for h in
                           (outA["history"] + outB["history"])],
        "served_query_ms": round(served_ms, 1),
        "served_top1_correct": bool(hit),
        "total_s": round(time.time() - t_all, 1),
    }), flush=True)


if __name__ == "__main__":
    import logging

    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(name)s %(message)s")
    main()
