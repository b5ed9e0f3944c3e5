"""Siamese metric-learning workflow: train -> create index -> evaluate.

Script equivalent of the reference's notebooks (Siamese.ipynb cells 11-17,
Siamese_pytorch.ipynb cells 14-19): train the embedding net on a folder of
single-instance-class images (e.g. trading cards), build a 128-D cosine
index, and cross-check the index against brute force.

    python examples/siamese_workflow.py --train-dir cards/train --valid-dir cards/valid

Recipe notes (measured — BENCH_NOTES "composed end-to-end ON the chip"):
from a RANDOM backbone the pair-based ``self_supervised_circle`` loss
converges cleanly at reference geometry while the triple ``circle`` form
can destabilize early; keep lr at the reference 1e-4; and if you stop a
run mid-descent remember best-val gating may not have saved recent
epochs — ``Trainer.save_checkpoint`` the final state explicitly (see
benchmarks/siamese_e2e_chip.py ``save_final``) before building an index
from "the latest checkpoint".
"""

from __future__ import annotations

import sys
from pathlib import Path as _P

sys.path.insert(0, str(_P(__file__).resolve().parent.parent))  # repo root

import argparse
import tempfile
from pathlib import Path

import numpy as np

from image_search_engine_tpu.training.siamese.config import SiameseConfig
from image_search_engine_tpu.training.siamese.create_index import create_index
from image_search_engine_tpu.training.siamese.eval import query_index, recall_at_k
from image_search_engine_tpu.training.siamese.train import Trainer


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--train-dir", type=Path, required=True)
    ap.add_argument("--valid-dir", type=Path, required=True)
    ap.add_argument("--epochs", type=int, default=5)
    ap.add_argument("--loss", default="circle")
    ap.add_argument("--backbone", default="densenet121")
    ap.add_argument("--image-size", type=int, nargs=2, default=(352, 256))
    args = ap.parse_args()

    work = Path(tempfile.mkdtemp(prefix="ise_siamese_"))
    cfg = SiameseConfig(
        train_dir=args.train_dir, valid_dir=args.valid_dir,
        ckpt_dir=work / "ckpts", log_file=work / "metrics.jsonl",
        backbone=args.backbone, image_size=tuple(args.image_size),
        loss=args.loss, epochs=args.epochs,
    )

    print("training ...")
    result = Trainer(cfg).run()
    print(f"best val loss: {result['best_val']:.4f}")

    print("building index ...")
    index = create_index(cfg, args.train_dir, work / "siamese.index.npz", work / "images.csv")
    manual = create_index(cfg, args.train_dir, work / "manual.npz", work / "images.csv",
                          manual=True)

    # cross-check: flat index vs brute force (the reference's faiss-vs-dict
    # oracle, test_index.py:49-71)
    q = manual[:8]
    _, fi = query_index(q, index, "flat", k=cfg.n_results)
    _, bi = query_index(q, manual, "bruteforce", k=cfg.n_results)
    print(f"flat-vs-bruteforce recall@{cfg.n_results}: {recall_at_k(fi, bi):.3f}")
    print(f"artifacts in {work}")


if __name__ == "__main__":
    import logging

    logging.basicConfig(level=logging.INFO)
    main()
