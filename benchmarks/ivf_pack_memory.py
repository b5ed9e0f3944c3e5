"""IVF build host-memory high-water: streamed _pack vs whole-array gather.

The packed (nbuckets, cap, d) probe table is the IVF build's host-memory
hot spot (VERDICT r2 weak #5): the old whole-array fancy-index built the
f32 gather result, an astype copy (bf16 tables), and ANOTHER f32 copy for
norms — each a full table. index/ivf.IVFIndex._pack now streams ~128 MB
bucket-block chunks into a preallocated final-dtype array, so high-water
is corpus + final table + one chunk.

Each variant runs in a fresh subprocess; the number reported is
ru_maxrss (peak RSS) of that process. CPU-only, no TPU needed.

    python benchmarks/ivf_pack_memory.py [--n 1000000] [--d 128]
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
from pathlib import Path

CHILD = r"""
import resource, sys
import numpy as np
sys.path.insert(0, "@REPO@")
import jax
jax.config.update("jax_platforms", "cpu")
from image_search_engine_tpu.index.ivf import IVFIndex, _build_buckets

variant, n, d, table_dtype = sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
rng = np.random.default_rng(0)
# f32 directly — standard_normal's float64 intermediate would leave a
# freed N*d*8 heap hole that silently absorbs the pack allocations and
# corrupts the RSS high-water comparison
x = rng.random((n, d), dtype=np.float32)
codes = rng.integers(0, 1024, n).astype(np.int32)
base = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss  # KB

idx = IVFIndex(nlist=1024, table_dtype=table_dtype)
idx.vectors = x
idx.lists, idx.bucket_cell = _build_buckets(codes, 1024)
idx.list_valid = idx.lists >= 0
idx.centroids = rng.standard_normal((1024, d)).astype(np.float32)

if variant == "streamed":
    idx._pack()
elif variant == "whole":  # the retired round-2 formulation, for comparison
    idx.packed = idx.vectors[np.maximum(idx.lists, 0)]
    idx.packed[~idx.list_valid] = 0.0
    if table_dtype == "bf16":
        import jax.numpy as jnp
        idx.packed = idx.packed.astype(jnp.bfloat16)
    packed32 = idx.packed.astype(np.float32)
    idx.packed_norms = np.where(
        idx.list_valid, (packed32 * packed32).sum(axis=2), np.inf
    ).astype(np.float32)
else:
    raise SystemExit(f"unknown variant {variant}")

peak = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
corpus_mb = n * d * 4 / 1e6
table_mb = idx.packed.nbytes / 1e6
print(f"RESULT {variant} {table_dtype}: peak_rss {peak/1e3:.0f} MB "
      f"(pre-pack {base/1e3:.0f} MB, corpus {corpus_mb:.0f} MB, "
      f"table {table_mb:.0f} MB, norms {idx.packed_norms.nbytes/1e6:.0f} MB)")
"""


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--d", type=int, default=128)
    args = ap.parse_args()
    repo = str(Path(__file__).resolve().parent.parent)
    script = CHILD.replace("@REPO@", repo)
    for dtype in ("f32", "bf16"):
        for variant in ("whole", "streamed"):
            out = subprocess.run(
                [sys.executable, "-c", script, variant, str(args.n),
                 str(args.d), dtype],
                capture_output=True, text=True, check=True,
            )
            for line in out.stdout.splitlines():
                if line.startswith("RESULT"):
                    print(line)


if __name__ == "__main__":
    main()
