"""End-to-end quickstart: index a folder, query it, print results.

Script equivalent of the reference's Colab notebooks (siamese_tf/
Siamese.ipynb, siamese_pt/Siamese_pytorch.ipynb drove the same flow from
cells). Generates a small synthetic corpus if you don't pass one.

    python examples/quickstart.py [--data-dir photos/] [--method dnn]
"""

from __future__ import annotations

import sys
from pathlib import Path as _P

sys.path.insert(0, str(_P(__file__).resolve().parent.parent))  # repo root

import argparse
import tempfile
from pathlib import Path

import numpy as np
from PIL import Image

from image_search_engine_tpu.config import Config, DnnModel, IndexType, Method
from image_search_engine_tpu.engine import QueryEngine
from image_search_engine_tpu.indexer import main as build_index
from image_search_engine_tpu.utils.imageio import load_image


def synthetic_corpus(root: Path, groups=4, per_group=5, size=96) -> Path:
    rng = np.random.default_rng(0)
    img_dir = root / "images"
    img_dir.mkdir(parents=True, exist_ok=True)
    for g in range(groups):
        low = rng.random((8, 8, 3)) * 0.7 + 0.15
        base = np.asarray(
            Image.fromarray((low * 255).astype(np.uint8)).resize((size, size)), np.float32
        ) / 255.0
        for i in range(per_group):
            img = np.clip(base + 0.03 * rng.standard_normal(base.shape), 0, 1)
            Image.fromarray((img * 255).astype(np.uint8)).save(img_dir / f"g{g}_{i}.png")
    return img_dir


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-dir", type=Path, default=None)
    ap.add_argument("--method", default="dnn", choices=["dnn", "bovw", "dhash"])
    ap.add_argument("--model", default="resnet-tiny", help="resnet50 for real corpora")
    args = ap.parse_args()

    work = Path(tempfile.mkdtemp(prefix="ise_quickstart_"))
    data_dir = args.data_dir or synthetic_corpus(work)
    cfg = Config(
        data_dir=data_dir,
        artifacts_dir=work / "artifacts",
        method=Method(args.method),
        dnn_model=DnnModel(args.model),
        index_type=IndexType.L2,
        resize_size=96,
        embed_batch_size=8,
        num_images_to_return=5,
    )

    print(f"indexing {data_dir} ...")
    build_index(cfg)

    engine = QueryEngine(cfg)
    query_path = engine.paths[0]
    print(f"querying with {query_path}:")
    for dist, _thumb, path in engine.query(load_image(query_path)):
        print(f"  {dist:10.4f}  {path}")


if __name__ == "__main__":
    import logging

    logging.basicConfig(level=logging.INFO)
    main()
