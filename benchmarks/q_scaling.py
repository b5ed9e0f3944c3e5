"""Measure exact-kNN QPS vs. query-batch size Q (and tile_n).

The phase-1 sweep streams the whole store once per dispatch, so its time is
~constant in Q until the MXU or phase-2 gather traffic takes over; QPS
should rise nearly linearly with Q up to that knee. This script finds the
knee on the attached chip so bench.py can sit on it.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

N = 1_000_000
D = 128
K = 10
ITERS = 20


def main() -> None:
    import jax
    import jax.numpy as jnp

    from image_search_engine_tpu.ops.topk_pallas import topk_twophase

    rng = np.random.default_rng(0)
    xh = rng.standard_normal((N, D)).astype(np.float32)
    x = jnp.asarray(xh, jnp.bfloat16)
    xn = jnp.sum(jnp.asarray(xh) * jnp.asarray(xh), axis=1)

    # RTT measure
    tiny = jax.jit(lambda v: v + 1.0)
    _ = np.asarray(tiny(jnp.zeros((8, 128))))
    t0 = time.time()
    for _ in range(3):
        _ = np.asarray(tiny(jnp.zeros((8, 128))))
    rtt = (time.time() - t0) / 3

    configs = [(512, 4096), (1024, 2048), (2048, 2048), (2048, 1024)]
    if len(sys.argv) > 1:
        configs = [tuple(int(v) for v in pair.split(":")) for pair in sys.argv[1:]]

    for q_batch, tile_n in configs:
        qh = rng.standard_normal((ITERS, q_batch, D)).astype(np.float32)
        qs = [jnp.asarray(qh[i]) for i in range(ITERS)]

        def search(qq, tn=tile_n):
            return topk_twophase(qq, x, K, "l2", x_norms=xn, tile_n=tn)

        t0 = time.time()
        d, i = search(qs[0])
        _ = np.asarray(d)
        compile_s = time.time() - t0

        t0 = time.time()
        for it in range(ITERS):
            d, i = search(qs[it])
        _ = np.asarray(d)
        elapsed = max(time.time() - t0 - rtt, 1e-9)
        qps = ITERS * q_batch / elapsed

        # spot recall on 8 queries
        q8 = qh[0][:8].astype(np.float64)
        x64 = xh.astype(np.float64)
        d64 = (q8**2).sum(1)[:, None] - 2 * q8 @ x64.T + (x64**2).sum(1)[None, :]
        ref_i = np.argsort(d64, axis=1)[:, :K]
        got_i = np.asarray(search(qs[0])[1])[:8]
        recall = float(np.mean(
            [len(set(a) & set(b)) / K for a, b in zip(got_i.tolist(), ref_i.tolist())]
        ))
        print(json.dumps({
            "Q": q_batch, "tile_n": tile_n, "qps": round(qps, 1),
            "ms_per_sweep": round(1000 * elapsed / ITERS, 2),
            "recall@10": recall, "compile_s": round(compile_s, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
