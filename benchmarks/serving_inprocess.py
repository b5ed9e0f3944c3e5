"""In-process serving concurrency: QueryEngine.query driven from N
threads, no HTTP and no tunnel-RTT floor in the request path.

Round 1's HTTP benchmark (benchmarks/serving_qps.py) measured 64 QPS at
concurrency 4 with --micro-batch showing no gain — inconclusive because
the ~30 ms axon readback RTT floor dominated. This isolates the serving
layer itself: per-query device work is a fused embed+search dispatch, so
throughput should scale with concurrency until dispatches saturate the
device stream, and micro-batching should pay once per-dispatch overhead
(not RTT) is the binding term.

    python benchmarks/serving_inprocess.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import concurrent.futures as cf

import numpy as np


def build_corpus(root: Path, n_groups=3, per=4, size=224):
    from PIL import Image

    rng = np.random.default_rng(0)
    root.mkdir(parents=True, exist_ok=True)
    for g in range(n_groups):
        base = rng.uniform(0, 1, (8, 8, 3))
        for i in range(per):
            img = np.clip(base + rng.normal(0, 0.03, base.shape), 0, 1)
            im = Image.fromarray((img * 255).astype(np.uint8)).resize(
                (size, size), Image.BILINEAR)
            im.save(root / f"g{g}_{i}.png")


def drive(engine, images, concurrency: int, seconds: float = 8.0):
    stop_at = time.time() + seconds
    lat = []

    def worker(wid):
        rng = np.random.default_rng(wid)
        n = 0
        while time.time() < stop_at:
            img = images[rng.integers(len(images))]
            t0 = time.time()
            engine.query(img, k=3)
            lat.append(time.time() - t0)
            n += 1
        return n

    with cf.ThreadPoolExecutor(concurrency) as pool:
        counts = list(pool.map(worker, range(concurrency)))
    total = sum(counts)
    arr = np.sort(np.asarray(lat))
    return (total / seconds, arr[int(0.5 * len(arr))] * 1e3,
            arr[int(0.9 * len(arr))] * 1e3)


def main():
    import tempfile

    from image_search_engine_tpu.config import Config, DnnModel, IndexType, Method
    from image_search_engine_tpu.engine import QueryEngine
    from image_search_engine_tpu.indexer import main as indexer_main
    from image_search_engine_tpu.utils.imageio import load_image

    tmp = Path(tempfile.mkdtemp(prefix="serve_bench_"))
    build_corpus(tmp / "images")
    for micro in (False, True):
        cfg = Config(
            data_dir=tmp / "images", artifacts_dir=tmp / f"art_{micro}",
            method=Method.DNN, dnn_model=DnnModel.RESNET_TINY,
            index_type=IndexType.L2, embed_batch_size=4,
            micro_batch=micro, micro_batch_wait_ms=2.0, micro_batch_max=8,
        )
        indexer_main(cfg)
        engine = QueryEngine(cfg)
        images = [load_image(p) for p in engine.paths]
        label = "micro-batch" if micro else "per-request"
        for conc in (1, 2, 4, 8, 16):
            qps, p50, p90 = drive(engine, images, conc)
            print(f"{label:12s} conc={conc:2d}: {qps:7.1f} QPS  "
                  f"p50 {p50:6.1f} ms  p90 {p90:6.1f} ms", flush=True)


if __name__ == "__main__":
    main()
