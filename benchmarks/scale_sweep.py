"""Single-chip capacity sweep: exact k-NN QPS vs corpus size.

BASELINE's operating point is 1M x 128; this measures the same fused
two-phase exact search (bench.py operating point: Q=2048, k=10, margin 2,
bf16 store, certificate on) at 1M/2M/4M rows on ONE chip. The bf16 store
is N*256 B (1 GB at 4M) — comfortably HBM-resident; phase 1 streams the
whole store per dispatch, so QPS should fall ~1/N while the exactness
certificate keeps holding.

``--dtype int8`` swaps in the int8 store (codes + per-row scales,
generated and quantized on-device so nothing rides the tunnel): half
the bf16 footprint again, extending one chip's exact-search capacity
to 8M x 128 (~1.06 GB resident).

    python benchmarks/scale_sweep.py [--iters 8] [--dtype bf16|int8]
        [--sizes N ...]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

D, Q, K, TILE_N = 128, 2048, 10, 4096


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--sizes", type=int, nargs="+",
                    default=[1_000_000, 2_000_000, 4_000_000])
    ap.add_argument("--dtype", choices=("bf16", "int8"), default="bf16",
                    help="int8 halves the store again (N bytes/row + 4 B "
                    "scale): 8M x 128 fits in ~1.06 GB, doubling the "
                    "exact-search corpus one chip can hold vs bf16")
    args = ap.parse_args()

    from image_search_engine_tpu.utils import compile_cache

    compile_cache.enable()  # tunnel-flake insurance: relaunch skips compiles

    import jax
    import jax.numpy as jnp

    from image_search_engine_tpu.ops.topk_pallas import (
        quantize_store_int8, topk_twophase)

    assert jax.default_backend() == "tpu"
    rng = np.random.default_rng(0)
    qh = rng.standard_normal((args.iters, Q, D)).astype(np.float32)
    qs = [jnp.asarray(qh[i]) for i in range(args.iters)]

    tiny = jax.jit(lambda v: v + 1.0)
    _ = np.asarray(tiny(jnp.zeros((8, 128))))
    t0 = time.time()
    for _ in range(3):
        _ = np.asarray(tiny(jnp.zeros((8, 128))))
    rtt = (time.time() - t0) / 3

    for n in args.sizes:
        if args.dtype == "int8":
            # generate + quantize ON DEVICE, chunk-wise: no tunnel upload
            # at all (8M f32 would be a 4 GB host->device copy at
            # ~27 MB/s), and the f32 intermediate never exceeds one chunk
            chunk = 1_000_000
            gen = jax.jit(lambda key: quantize_store_int8(
                jax.random.normal(key, (chunk, D), jnp.float32)))
            codes, scales = [], []
            for c in range((n + chunk - 1) // chunk):
                cd, sc = gen(jax.random.PRNGKey(c))
                codes.append(cd)
                scales.append(sc)
            x = jnp.concatenate(codes)[:n]
            xs = jnp.concatenate(scales)[:n]
            del codes, scales
            # norms of the DEQUANTIZED rows = scale^2 * sum(codes^2)
            xn = jax.jit(lambda cd, sc: sc * sc * jnp.sum(
                cd.astype(jnp.float32) ** 2, axis=1))(x, xs)
            store_bytes = n * (D + 4)
        else:
            # generate + upload bf16 (half the tunnel bytes); norms computed
            # on DEVICE from the bf16 store values (same values the kernel
            # sees) — an earlier revision downloaded the 4M store (2 GB)
            # through the ~27 MB/s tunnel just to compute norms on host,
            # which read as a >25 min "compile"
            xh = rng.standard_normal((n, D)).astype(np.float32).astype(jnp.bfloat16)
            x = jnp.asarray(xh)
            del xh
            xs = None
            xn = jax.jit(lambda v: jnp.einsum(
                "nd,nd->n", v.astype(jnp.float32), v.astype(jnp.float32)))(x)
            store_bytes = n * D * 2
        # fence with a tiny readback: block_until_ready does not reliably
        # block over the tunnel (CLAUDE.md gotchas) and an in-flight norms
        # einsum would otherwise be charged to compile_s
        _ = np.asarray(xn[:8])

        def fn(q):
            return topk_twophase(q, x, K, "l2", x_norms=xn, x_scale=xs,
                                 tile_n=TILE_N,
                                 t_margin=2, fused_rescore=True,
                                 with_certificate=True)

        t0 = time.time()
        d, i, cert = fn(qs[0])
        _ = np.asarray(d)
        compile_s = time.time() - t0
        t0 = time.time()
        certs = []
        for it in range(args.iters):
            d, i, cert = fn(qs[it])
            certs.append(cert)
        _ = np.asarray(d)
        el = max(time.time() - t0 - rtt, 1e-9)
        cert_ok = all(bool(np.asarray(c).all()) for c in certs)
        print(json.dumps({
            "n": n,
            "dtype": args.dtype,
            "store_gb": round(store_bytes / 1e9, 2),
            "ms_per_dispatch": round(1000 * el / args.iters, 2),
            "qps": round(args.iters * Q / el),
            "certificate_ok": cert_ok,
            "compile_s": round(compile_s, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
