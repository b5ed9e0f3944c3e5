"""Sharded (mesh) index-build host-memory high-water: streamed vs the
retired whole-array formulation (VERDICT r3 weak #1).

Round 3 streamed the single-chip ``IVFIndex._pack`` (see
ivf_pack_memory.py) but the MESH builds kept the whole-array pattern:
``ShardedIVF.from_components`` materialized the full (S, nb, cap, d) f32
packed table on host PLUS a second full-size f32 copy for norms
(``table32``), and ``ShardedIVFPQ.from_codes`` a full padded copy of the
raw rerank rows. Scale-out is where N is largest, so the mesh build hit
host RAM first. Now:

  * the packed table streams shard-block-at-a-time straight onto each
    device via ``jax.make_array_from_callback`` — the full host table
    never exists (gather chunks bounded at ~128 MB);
  * bf16-table norms derive per chunk from dtype-rounded gathers — no
    full-size f32 table copy;
  * rerank raw rows stream per shard the same way; norms chunked.

Each variant runs in a fresh subprocess on a virtual 8-device CPU mesh;
the number is ru_maxrss of that process. NOTE: on the CPU backend the
"device" arrays live in host RAM too (a real TPU host would not hold
them), so the absolute numbers overstate a TPU host's RSS — the
STREAMED-vs-WHOLE delta is the measurement.

PQ raw-rows caveat (round 4): pq_whole 1819 MB vs pq_streamed 1940 MB is
a WASH **on CPU only** — ``jnp.asarray`` zero-copies f32 host arrays on
the CPU backend, while the streamed callback's per-shard blocks are real
copies, so the comparison is backend-biased. The TPU-host arithmetic is:
whole = corpus + a full padded (S*r, d) f32 copy (+N*d*4 high-water);
streamed = corpus + ONE shard block at a time (+N*d*4/S). Do not read
the CPU wash as "streaming buys nothing for PQ raw rows".

    python benchmarks/sharded_pack_memory.py [--n 1000000] [--d 128]
"""

from __future__ import annotations

import argparse
import subprocess
import sys
from pathlib import Path

CHILD = r"""
import os, resource, sys
import numpy as np
sys.path.insert(0, "@REPO@")
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from image_search_engine_tpu.ops import round_up
from image_search_engine_tpu.parallel.mesh import make_mesh
from image_search_engine_tpu.parallel.ivf import ShardedIVF, ShardedIVFPQ

variant, n, d, table_dtype = sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
nlist = 256
rng = np.random.default_rng(0)
x = rng.random((n, d), dtype=np.float32)  # f32 directly (no f64 heap hole)
centroids = np.ascontiguousarray(x[rng.choice(n, nlist, replace=False)])
mesh = make_mesh(8)
base = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss  # KB

if variant == "ivf_streamed":
    idx = ShardedIVF.from_components(x, centroids, 8, mesh,
                                     table_dtype=table_dtype)
    table_mb = idx.packed.nbytes / 1e6
elif variant == "ivf_whole":  # the retired round-3 formulation
    from image_search_engine_tpu.index.ivf import _build_buckets
    from image_search_engine_tpu.ops.kmeans import assign_jax
    s = mesh.shape["data"]
    r = round_up(-(-n // s), 8)
    codes = np.asarray(assign_jax(jnp.asarray(x), jnp.asarray(centroids))[0])
    per_shard = []
    for si in range(s):
        lo = si * r
        lst, b_cell = _build_buckets(codes[lo : min(lo + r, n)], nlist)
        per_shard.append((lo, lst, b_cell))
    cap = max(l.shape[1] for _, l, _ in per_shard)
    nb = max(l.shape[0] for _, l, _ in per_shard)
    lists = np.full((s, nb, cap), -1, np.int32)
    packed = np.zeros((s, nb, cap, d), np.float32)
    for si, (lo, l, b_cell) in enumerate(per_shard):
        valid = l >= 0
        lists[si, : l.shape[0], : l.shape[1]] = np.where(l >= 0, l + lo, -1)
        rows = x[lo + np.maximum(l, 0)]
        rows[~valid] = 0.0
        packed[si, : l.shape[0], : l.shape[1]] = rows
    table = jnp.asarray(packed.reshape(s * nb, cap, d))
    if table_dtype == "bf16":
        table = table.astype(jnp.bfloat16)
    table32 = np.asarray(table, np.float32).reshape(s, nb, cap, d)
    pnorms = np.where(lists >= 0, (table32 * table32).sum(axis=3),
                      np.inf).astype(np.float32)
    dev = jax.device_put(table, NamedSharding(mesh, P("data", None, None)))
    devn = jax.device_put(jnp.asarray(pnorms.reshape(s * nb, cap)),
                          NamedSharding(mesh, P("data", None)))
    table_mb = dev.nbytes / 1e6
elif variant in ("pq_streamed", "pq_whole"):
    m = 16
    codes = rng.integers(0, 256, (n, m)).astype(np.uint8)
    row_cell = rng.integers(0, nlist, n).astype(np.int32)
    books = rng.random((m, 256, d // m)).astype(np.float32)
    if variant == "pq_streamed":
        idx = ShardedIVFPQ.from_codes(codes, row_cell, centroids, books, 8,
                                      mesh, raw=x, rerank=32)
        table_mb = idx.raw_rows.nbytes / 1e6
    else:  # codes machinery shared; raw attach = the retired padded full copy
        idx = ShardedIVFPQ.from_codes(codes, row_cell, centroids, books, 8,
                                      mesh, raw=None)
        s = mesh.shape["data"]
        r = idx.rows_per_shard
        rr = np.zeros((s * r, d), np.float32)
        rr[:n] = x
        rn = np.full(s * r, np.inf, np.float32)
        rn[:n] = (rr[:n] * rr[:n]).sum(axis=1)
        idx.raw_rows = jax.device_put(jnp.asarray(rr),
                                      NamedSharding(mesh, P("data", None)))
        idx.raw_norms = jax.device_put(jnp.asarray(rn),
                                       NamedSharding(mesh, P("data")))
        table_mb = idx.raw_rows.nbytes / 1e6
else:
    raise SystemExit(f"unknown variant {variant}")

peak = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
print(f"RESULT {variant} {table_dtype}: peak_rss {peak/1e3:.0f} MB "
      f"(pre-build {base/1e3:.0f} MB, corpus {n*d*4/1e6:.0f} MB, "
      f"device table {table_mb:.0f} MB)")
"""


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--d", type=int, default=128)
    ap.add_argument("--only", default=None, help="substring filter on variant")
    args = ap.parse_args()
    repo = str(Path(__file__).resolve().parent.parent)
    script = CHILD.replace("@REPO@", repo)
    runs = [("ivf_whole", "f32"), ("ivf_streamed", "f32"),
            ("ivf_whole", "bf16"), ("ivf_streamed", "bf16"),
            ("pq_whole", "f32"), ("pq_streamed", "f32")]
    for variant, dtype in runs:
        if args.only and args.only not in variant:
            continue
        out = subprocess.run(
            [sys.executable, "-c", script, variant, str(args.n),
             str(args.d), dtype],
            capture_output=True, text=True, check=True,
        )
        for line in out.stdout.splitlines():
            if line.startswith("RESULT"):
                print(line, flush=True)


if __name__ == "__main__":
    main()
