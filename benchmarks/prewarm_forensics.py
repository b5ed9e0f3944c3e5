"""Attribute a slow engine start: cache miss vs cache-hit-but-slow-dispatch.

Constructs the REAL `QueryEngine` against an existing artifacts dir with
JAX's compilation-cache debug logging enabled, so the log shows, per
program, whether the persistent cache hit (and how long the executable
load took) versus a fresh XLA compile — separating the two terms of
prewarm wall time (compile / first dispatch). Used to diagnose a 427 s
engine restart that turned out to be a 0.14 s cache HIT followed by a
~78 s first dispatch through the dev tunnel (BENCH_NOTES "End-to-end
verify at HEAD"); the engine now logs the split itself, this script is
for when the split needs per-program attribution.

Usage (from the repo root, hits the real TPU):
    python benchmarks/prewarm_forensics.py --artifacts-dir /tmp/x/artifacts \
        [--index-type cell-probe] [--dnn-model resnet-tiny]

Look for in the output:
    "Persistent compilation cache hit for 'jit_fused..."   <- hit
    "PERSISTENT COMPILATION CACHE MISS for 'jit_fused..."  <- miss
    "Not writing persistent cache entry for ... host callbacks/seconds"
"""
import argparse
import logging
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv=None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--artifacts-dir", type=Path, required=True)
    ap.add_argument("--index-type", default="cell-probe",
                    choices=["l2", "cosine", "cell-probe"])
    ap.add_argument("--dnn-model", default="resnet-tiny")
    a = ap.parse_args(argv)

    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(name)s %(message)s")
    for name in ("jax._src.compiler", "jax._src.compilation_cache",
                 "jax._src.lru_cache", "jax._src.dispatch"):
        logging.getLogger(name).setLevel(logging.DEBUG)

    import jax

    jax.config.update(
        "jax_debug_log_modules",
        "jax._src.compiler,jax._src.compilation_cache,jax._src.lru_cache")

    from image_search_engine_tpu.config import (Config, DnnModel, IndexType,
                                                Method)
    from image_search_engine_tpu.engine import QueryEngine
    from image_search_engine_tpu.utils.compile_cache import enable

    enable()
    cfg = Config(artifacts_dir=a.artifacts_dir, method=Method("dnn"),
                 index_type=IndexType(a.index_type),
                 dnn_model=DnnModel(a.dnn_model))
    t0 = time.time()
    QueryEngine(cfg, prewarm=True)
    print(f"engine ready in {time.time() - t0:.1f}s", flush=True)


if __name__ == "__main__":
    main()
