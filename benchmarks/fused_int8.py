"""int8 store + fused int8 phase-2: validate vs the unfused int8 path and
time at the headline operating point (1M x 128, Q=2048, k=10).

Expected: phase-1 stream 128 MB (vs bf16's 256 MB) and phase-2 candidate
gather 8 KB/group (vs 32 KB), so both phases shrink; recall vs the f32
corpus pays the ~2% int8 quantization cost (exact over the quantized
store).

    python benchmarks/fused_int8.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

N, D, Q, K, ITERS, TILE_N = 1_000_000, 128, 2048, 10, 20, 4096


def main():
    import jax
    import jax.numpy as jnp

    from image_search_engine_tpu.ops.topk_pallas import (
        quantize_store_int8,
        topk_twophase,
    )

    assert jax.default_backend() == "tpu"

    rng = np.random.default_rng(0)
    xh = rng.standard_normal((N, D)).astype(np.float32)
    codes, scales = quantize_store_int8(jnp.asarray(xh))
    deq = np.asarray(codes, np.float32) * np.asarray(scales)[:, None]
    xn = jnp.asarray(np.sum(deq * deq, axis=1))  # dequant-true norms
    qh = rng.standard_normal((ITERS, Q, D)).astype(np.float32)
    qs = [jnp.asarray(qh[i]) for i in range(ITERS)]

    def fn(q, m, fused):
        return topk_twophase(q, codes, K, "l2", x_norms=xn, x_scale=scales,
                             tile_n=TILE_N, t_margin=m, fused_rescore=fused)

    # recall vs f32 brute force (first 256 queries)
    q0 = qh[0][:256]
    d_full = (q0**2).sum(1)[:, None] - 2.0 * q0 @ xh.T + (xh**2).sum(1)[None, :]
    ref = np.argpartition(d_full, K, axis=1)[:, :K]
    i2 = np.asarray(fn(qs[0], 2, True)[1])[:256]
    rec = float(np.mean([len(set(a) & set(b)) / K
                         for a, b in zip(i2.tolist(), ref.tolist())]))
    print(f"int8 fused m2 recall@10 vs f32 brute = {rec:.5f}", flush=True)

    # agreement with the unfused int8 path (same quantized values scored)
    iu = np.asarray(fn(qs[0], 2, False)[1])
    agree = float((np.sort(i2, 1) == np.sort(iu[:256], 1)).all(1).mean())
    print(f"fused-vs-unfused agreement (m2, 256q) = {agree:.4f}", flush=True)

    # margin validation: m1/m2 vs m6 over all dispatches
    for m in (1, 2):
        mism = 0
        for it in range(ITERS):
            i6 = np.asarray(fn(qs[it], 6, True)[1])
            im = np.asarray(fn(qs[it], m, True)[1])
            mism += int((~(np.sort(i6, 1) == np.sort(im, 1)).all(1)).sum())
        print(f"validation m{m} vs m6: {mism} / {ITERS*Q}", flush=True)

    # timing
    tiny = jax.jit(lambda v: v + 1.0)
    _ = np.asarray(tiny(jnp.zeros((8, 128))))
    t0 = time.time()
    for _ in range(3):
        _ = np.asarray(tiny(jnp.zeros((8, 128))))
    rtt = (time.time() - t0) / 3
    for m in (1, 2, 3):
        d, i = fn(qs[0], m, True)
        _ = np.asarray(d)
        t0 = time.time()
        for it in range(ITERS):
            d, i = fn(qs[it], m, True)
        _ = np.asarray(d)
        el = max(time.time() - t0 - rtt, 1e-9)
        print(f"int8 fused m{m}: {el/ITERS*1e3:.2f} ms/dispatch, "
              f"{ITERS*Q/el/1e3:.1f}k QPS", flush=True)


if __name__ == "__main__":
    main()
