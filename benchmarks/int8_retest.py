"""Re-measure the int8-store sweep now that candidate gathers are
block-contiguous (the earlier "int8 is slower" verdict predates that fix
and was dominated by the same random-read pathology).

int8 halves the phase-1 HBM stream vs bfloat16 (128 MB vs 256 MB at
1M x 128); phase 2 rescans candidates dequantized to f32 for exact
rescoring w.r.t. the quantized store.
"""

from __future__ import annotations

import json
import time

import numpy as np

N = 1_000_000
D = 128
K = 10
ITERS = 20


def main() -> None:
    import jax
    import jax.numpy as jnp

    from image_search_engine_tpu.ops.topk_pallas import (
        quantize_store_int8,
        topk_twophase,
    )

    rng = np.random.default_rng(0)
    xh = rng.standard_normal((N, D)).astype(np.float32)
    codes, scales = quantize_store_int8(jnp.asarray(xh))
    deq = np.asarray(codes, np.float32) * np.asarray(scales)[:, None]
    xn = jnp.asarray((deq * deq).sum(1))

    tiny = jax.jit(lambda v: v + 1.0)
    _ = np.asarray(tiny(jnp.zeros((8, 128))))
    t0 = time.time()
    for _ in range(3):
        _ = np.asarray(tiny(jnp.zeros((8, 128))))
    rtt = (time.time() - t0) / 3

    x64 = xh.astype(np.float64)
    x64n = (x64**2).sum(1)

    for q_batch in (2048,):
        qh = rng.standard_normal((ITERS, q_batch, D)).astype(np.float32)
        qs = [jnp.asarray(qh[i]) for i in range(ITERS)]

        def search(qq):
            return topk_twophase(qq, codes, K, "l2", x_norms=xn,
                                 x_scale=scales, tile_n=4096)

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

        q8 = qh[0][:8].astype(np.float64)
        d64 = (q8**2).sum(1)[:, None] - 2 * q8 @ x64.T + x64n[None, :]
        ref_i = np.argsort(d64, axis=1)[:, :K]
        got_i = np.asarray(search(qs[0])[1])[:8]
        recall = float(np.mean(
            [len(set(a) & set(b)) / K for a, b in zip(got_i.tolist(), ref_i.tolist())]
        ))
        print(json.dumps({
            "variant": "int8_store", "Q": q_batch, "qps": round(qps, 1),
            "ms_per_sweep": round(1000 * elapsed / ITERS, 2),
            "recall@10": recall, "compile_s": round(compile_s, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
