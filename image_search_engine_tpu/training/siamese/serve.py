"""Serve a trained siamese index over the engine's HTTP contract.

The reference stops short of this: its siamese workflow ends at
notebook-driven queries (backend/siamese/test_index.py, Siamese.ipynb
cell 15) — the Flask server (backend/engine.py) only knows the DNN/BoVW/
DHASH methods. Here the L7 output composes with the L5 serving surface:
load the latest (or a named) checkpoint, the ``create_index`` artifacts
(flat-IP ``.npz`` + ``images.csv``), and answer ``POST /similar_images``
with the same ``{"prediction": [[distance, b64_thumb, path], ...]}``
payload the frontend already speaks. Cosine similarity, descending —
Faiss ``IndexFlatIP`` over normalized 128-D embeddings, exactly the
index ``create_index`` built.

    python -m image_search_engine_tpu.training.siamese.serve \
        --ckpt-dir artifacts/siamese_ckpts \
        --index artifacts/siamese.index.npz \
        --images-csv artifacts/siamese_images.csv --port 5001
"""

from __future__ import annotations

import argparse
import logging
import time
from http.server import ThreadingHTTPServer
from pathlib import Path
from types import SimpleNamespace
from typing import List, Optional, Tuple

import numpy as np

log = logging.getLogger(__name__)


class SiameseQueryEngine:
    """Image -> ranked (similarity, b64 thumb, path) through the trained
    embedding net + flat-IP index. Duck-typed to what
    ``engine.make_handler`` needs (query/paths/stats/cfg), so the HTTP
    layer is shared with the main engine, not duplicated."""

    def __init__(self, cfg, index_path, images_csv,
                 checkpoint: Optional[Path] = None, n_results: int = 9,
                 prewarm: bool = True):
        from image_search_engine_tpu.index.flat import FlatIndex
        from image_search_engine_tpu.training.siamese.config import get_latest_checkpoint
        from image_search_engine_tpu.training.siamese.train import Trainer
        from image_search_engine_tpu.utils.imageio import load_paths_csv
        from image_search_engine_tpu.utils.profiling import ServingStats

        self.scfg = cfg
        self.trainer = Trainer(cfg)
        ckpt = checkpoint or get_latest_checkpoint(cfg.ckpt_dir)
        if ckpt is not None:
            self.trainer.load_checkpoint(ckpt)
            log.info("serving with checkpoint %s", Path(ckpt).name)
        else:
            log.warning(
                "no checkpoint in %s — serving with RANDOM weights; "
                "rankings will be near chance (train first, or pass "
                "--checkpoint)", cfg.ckpt_dir)
        self.index = FlatIndex.load(index_path)
        self.paths: List[str] = [str(p) for p in load_paths_csv(images_csv)]
        if self.index.ntotal != len(self.paths):
            log.warning(
                "index holds %d rows but images.csv lists %d paths — "
                "artifacts out of sync (rebuild with create_index)",
                self.index.ntotal, len(self.paths))
        self.stats = ServingStats()
        # make_handler reads these off the engine object
        self.cfg = SimpleNamespace(
            num_images_to_return=n_results, thumbnail_size=256,
            micro_batch_mode=lambda: "off")
        if prewarm:
            t0 = time.time()
            h, w = cfg.image_size
            try:
                self._embed(np.zeros((h, w, 3), np.float32))
                log.info("prewarm finished in %.1fs", time.time() - t0)
            except Exception as e:  # noqa: BLE001 — first query compiles
                log.warning("prewarm failed (first query compiles): %s", e)

    def _embed(self, image: np.ndarray) -> np.ndarray:
        from PIL import Image as _Image

        h, w = self.scfg.image_size
        if image.shape[:2] != (h, w):
            im = _Image.fromarray((np.clip(image, 0, 1) * 255).astype(np.uint8))
            image = np.asarray(im.resize((w, h), _Image.BILINEAR),
                               np.float32) / 255.0
        emb = self.trainer.embed(image[None].astype(np.float32),
                                 batch_size=self.scfg.batch_size)
        return emb / np.maximum(np.linalg.norm(emb, axis=1, keepdims=True),
                                1e-12)

    def query(self, image: np.ndarray, k: Optional[int] = None
              ) -> List[Tuple[float, str, str]]:
        from image_search_engine_tpu.utils.imageio import thumbnail_b64

        k = k or self.cfg.num_images_to_return
        t0 = time.time()
        try:
            d, i = self.index.search(self._embed(image), k)
        except Exception:
            self.stats.record(time.time() - t0, error=True)
            raise
        self.stats.record(time.time() - t0)
        out = []
        for dist, idx in zip(d[0].tolist(), i[0].tolist()):
            if idx < 0 or idx >= len(self.paths):
                continue
            try:
                thumb = thumbnail_b64(self.paths[idx],
                                      self.cfg.thumbnail_size)
            except Exception:  # noqa: BLE001 — missing corpus file
                thumb = ""
            out.append((round(float(dist), 4), thumb, self.paths[idx]))
        return out


def serve(engine: "SiameseQueryEngine", host: str, port: int) -> None:
    from image_search_engine_tpu.engine import make_handler

    httpd = ThreadingHTTPServer((host, port), make_handler(engine))
    log.info("serving siamese index on http://%s:%d (corpus: %d images)",
             host, port, len(engine.paths))
    httpd.serve_forever()


def main(argv=None) -> None:
    from image_search_engine_tpu.training.siamese.config import SiameseConfig

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ckpt-dir", type=Path,
                    default=Path("artifacts/siamese_ckpts"))
    ap.add_argument("--checkpoint", type=Path, default=None,
                    help="specific checkpoint (default: latest epoch)")
    ap.add_argument("--index", type=Path,
                    default=Path("artifacts/siamese.index.npz"))
    ap.add_argument("--images-csv", type=Path,
                    default=Path("artifacts/siamese_images.csv"))
    ap.add_argument("--backbone", default="densenet121")
    ap.add_argument("--image-size", type=int, nargs=2, default=(352, 256),
                    metavar=("H", "W"))
    ap.add_argument("--embedding-dim", type=int, default=128)
    ap.add_argument("--n-results", type=int, default=9)  # reference N_RESULTS
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=5001)
    ap.add_argument("--no-prewarm", action="store_true")
    a = ap.parse_args(argv)
    cfg = SiameseConfig(ckpt_dir=a.ckpt_dir, backbone=a.backbone,
                        image_size=tuple(a.image_size),
                        embedding_dim=a.embedding_dim)
    engine = SiameseQueryEngine(cfg, a.index, a.images_csv,
                                checkpoint=a.checkpoint,
                                n_results=a.n_results,
                                prewarm=not a.no_prewarm)
    serve(engine, a.host, a.port)


if __name__ == "__main__":
    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(name)s %(message)s")
    main()
