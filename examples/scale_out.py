"""Scale-out walkthrough: shard every index family over a device mesh.

Runs anywhere — on a real multi-chip slice it uses the chips; on a dev
box it forces a virtual 8-device CPU mesh so the sharding/collective
code paths execute for real (the same trick the test suite uses).

    python examples/scale_out.py
"""

from __future__ import annotations

import os
import sys
from pathlib import Path as _P

sys.path.insert(0, str(_P(__file__).resolve().parent.parent))  # repo root

if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# default to the virtual CPU mesh: merely PROBING the backend would
# initialize it (and on a dev box that grabs the single-client TPU
# tunnel). On a real slice: ISE_SCALE_OUT_PLATFORM=tpu
jax.config.update("jax_platforms",
                  os.environ.get("ISE_SCALE_OUT_PLATFORM", "cpu"))

import numpy as np


def main() -> None:
    from image_search_engine_tpu.index.flat import FlatIndex
    from image_search_engine_tpu.index.ivf import IVFIndex, IVFPQIndex
    from image_search_engine_tpu.parallel.ivf import ShardedIVF, ShardedIVFPQ
    from image_search_engine_tpu.parallel.mesh import make_mesh

    mesh = make_mesh()
    print(f"mesh: {mesh.devices.size} x {jax.devices()[0].platform}")

    rng = np.random.default_rng(0)
    centers = rng.standard_normal((32, 64)).astype(np.float32) * 4
    x = np.concatenate(
        [c + rng.standard_normal((500, 64)).astype(np.float32) for c in centers])
    q = x[:4] + 0.05 * rng.standard_normal((4, 64)).astype(np.float32)

    # 1) exact flat search, row-sharded: per-shard fused scan + all_gather
    # merge over the mesh axis, exactness certificate per shard
    flat = FlatIndex("l2", mesh=mesh).add(x)
    d, i = flat.search(q, 5)
    print(f"sharded flat:    top-1 ids {i[:, 0].tolist()} (self-match "
          f"dist {d[:, 0].round(3).tolist()})")

    # 2) sharded IVF: per-shard balanced buckets, probed scan, ICI merge
    ivf = IVFIndex(nlist=16, nprobe=4).add(x)
    sivf = ShardedIVF.from_components(x, ivf.centroids, nprobe=4, mesh=mesh)
    d, i = sivf.search(q, 5)
    print(f"sharded IVF:     top-1 ids {i[:, 0].tolist()}")

    # 3) sharded IVF-PQ: the COMPRESSED index on the mesh — each shard
    # holds packed byte codes + replicated codebooks; reshards straight
    # from a codes-only artifact (no raw vectors needed)
    pq = IVFPQIndex(nlist=16, nprobe=8, m=8).add(x)
    spq = ShardedIVFPQ.from_index(pq, mesh)
    d, i = spq.search(q, 5)
    bytes_per_row = spq.packed_codes.shape[-1]
    print(f"sharded IVF-PQ:  top-1 ids {i[:, 0].tolist()} "
          f"({bytes_per_row} bytes/row vs {x.shape[1] * 4} raw — "
          f"{x.shape[1] * 4 // bytes_per_row}x compression on the mesh)")

    # 4) ...with the exact refine stage on the mesh: pass raw rows and a
    # shortlist size and each shard re-scores its own ADC top-C locally;
    # the merge then ranks EXACT distances (recall parity with the
    # single-chip rerank path)
    pq_r = IVFPQIndex(nlist=16, nprobe=8, m=8, rerank=32).add(x)
    spq_r = ShardedIVFPQ.from_index(pq_r, mesh)
    d, i = spq_r.search(q, 5)
    print(f"sharded IVF-PQ + exact rerank(32): top-1 ids {i[:, 0].tolist()} "
          f"(distances exact over the store)")


if __name__ == "__main__":
    main()
