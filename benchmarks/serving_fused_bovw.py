"""Single-query BoVW serving latency: the fused engine program vs the
stage-by-stage chain it replaced (VERDICT r2 next #5).

The engine now serves BoVW through ONE jitted program — describe ->
spherical-quantize -> histogram -> BM25 -> exact top-k with certificate —
with a single device_get per query (engine.py `fused_bovw`). The generic
chain pays a host hop (full tunnel RTT + dispatch) between every stage:
describe_batch readback, pipeline.transform readback(s), index.search.
Reference equivalent: backend/engine.py:93-98, which also wrote the query
to a TEMP PNG between stages.

Run against artifacts built by the indexer (the verify-recipe corpus):

    python -m image_search_engine_tpu.indexer --data-dir /tmp/vx/images \
        --artifacts-dir /tmp/vx/artifacts_bovw --method bovw \
        --corner-descriptor daisy --num-clusters 16 --resize-size 64
    python benchmarks/serving_fused_bovw.py \
        --artifacts-dir /tmp/vx/artifacts_bovw --resize-size 64
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def time_path(fn, reps: int) -> float:
    fn()  # warm (compile already done by prewarm/first call)
    t0 = time.time()
    for _ in range(reps):
        fn()
    return (time.time() - t0) / reps * 1e3


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--artifacts-dir", type=Path, required=True)
    ap.add_argument("--resize-size", type=int, default=64)
    ap.add_argument("--corner-descriptor", default="daisy")
    ap.add_argument("--reps", type=int, default=30)
    args = ap.parse_args()

    from image_search_engine_tpu.bovw.pipeline import BoVWPipeline
    from image_search_engine_tpu.config import (Config, CornerDescriptorKind,
                                                IndexType, Method)
    from image_search_engine_tpu.descriptors import make_descriptor
    from image_search_engine_tpu.engine import QueryEngine, _resize_host
    from image_search_engine_tpu.index.flat import FlatIndex
    from image_search_engine_tpu.utils.imageio import load_image

    cfg = Config(
        artifacts_dir=args.artifacts_dir, method=Method.BOVW,
        index_type=IndexType.COSINE,
        corner_descriptor=CornerDescriptorKind(args.corner_descriptor),
        resize_size=args.resize_size, num_images_to_return=5,
    )
    engine = QueryEngine(cfg)  # prewarms the fused program
    img = load_image(engine.paths[0])

    # fused: one jitted program, one readback
    fused_ms = time_path(lambda: engine._search(img, 5), args.reps)

    # generic: the retired stage-by-stage chain (host hop per stage)
    pipeline = BoVWPipeline.load(cfg.bovw_pipeline_path)
    descriptor = make_descriptor(cfg)
    index = FlatIndex.load(cfg.bovw_index_path)
    resized = _resize_host(img, args.resize_size)[None]

    def generic():
        feats, valid = descriptor.describe_batch(resized)
        hist = pipeline.transform(feats, valid)
        return index.search(hist.astype(np.float32), 5)

    generic_ms = time_path(generic, args.reps)

    d_f, i_f = engine._search(img, 5)
    d_g, i_g = generic()
    same = set(i_f[0].tolist()) == set(i_g[0].tolist())
    print(json.dumps({
        "fused_ms_per_query": round(fused_ms, 1),
        "generic_ms_per_query": round(generic_ms, 1),
        "speedup": round(generic_ms / fused_ms, 2),
        "id_sets_match": bool(same),
        "reps": args.reps,
    }))


if __name__ == "__main__":
    main()
