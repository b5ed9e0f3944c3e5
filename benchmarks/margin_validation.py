"""Lock the production candidate margin: timing + exactness validation of
``topk_twophase(t_margin=...)`` on the real chip.

For each store dtype (bf16, int8) and margin in {2, 3}: throughput at
Q=2048, and agreement with the wide-margin truth (bf16: margin 4; int8:
margin 6) over all 40960 dispatched queries. For int8 additionally a full
recall@10 of one 2048-query dispatch against f32 NumPy brute force (the
int8 result is exact over the quantized store; this measures the
quantization loss against the unquantized corpus).

    python benchmarks/margin_validation.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

N, D, Q, K, ITERS = 1_000_000, 128, 2048, 10, 20


def main():
    import jax
    import jax.numpy as jnp

    from image_search_engine_tpu.ops.topk_pallas import (
        quantize_store_int8,
        topk_twophase,
    )

    assert jax.default_backend() == "tpu", "run on the TPU"

    rng = np.random.default_rng(0)
    xh = rng.standard_normal((N, D)).astype(np.float32)
    x = jnp.asarray(xh, jnp.bfloat16)
    xn = jnp.sum(jnp.asarray(xh) * jnp.asarray(xh), axis=1)
    qh = rng.standard_normal((ITERS, Q, D)).astype(np.float32)
    qs = [jnp.asarray(qh[i]) for i in range(ITERS)]

    codes, scales = quantize_store_int8(jnp.asarray(xh))
    deq = np.asarray(codes, np.float32) * np.asarray(scales)[:, None]
    xn_int8 = jnp.asarray(np.sum(deq * deq, axis=1))

    def bf16_fn(margin):
        return lambda q: topk_twophase(q, x, K, "l2", x_norms=xn,
                                       tile_n=4096, t_margin=margin)

    def int8_fn(margin):
        return lambda q: topk_twophase(q, codes, K, "l2", x_norms=xn_int8,
                                       x_scale=scales, tile_n=4096,
                                       t_margin=margin)

    tiny = jax.jit(lambda v: v + 1.0)
    _ = np.asarray(tiny(jnp.zeros((8, 128))))
    t0 = time.time()
    for _ in range(3):
        _ = np.asarray(tiny(jnp.zeros((8, 128))))
    rtt = (time.time() - t0) / 3

    def timeit(name, fn):
        d, i = fn(qs[0])
        _ = np.asarray(d)
        t0 = time.time()
        for it in range(ITERS):
            d, i = fn(qs[it])
        _ = np.asarray(d)
        el = max(time.time() - t0 - rtt, 1e-9)
        print(f"{name}: {el/ITERS*1e3:.2f} ms/dispatch, {ITERS*Q/el/1e3:.1f}k QPS",
              flush=True)

    def validate(name, fn, truth_fn):
        mism = 0
        for it in range(ITERS):
            i_ref = np.asarray(truth_fn(qs[it])[1])
            i_m = np.asarray(fn(qs[it])[1])
            mism += int((~(np.sort(i_ref, 1) == np.sort(i_m, 1)).all(1)).sum())
        print(f"validation {name}: {mism} mismatched queries / {ITERS*Q}", flush=True)

    for m in (2, 3):
        timeit(f"bf16 margin={m}", bf16_fn(m))
    for m in (2, 3):
        timeit(f"int8 margin={m}", int8_fn(m))

    for m in (2, 3):
        validate(f"bf16 margin={m} vs margin=4", bf16_fn(m), bf16_fn(4))
    for m in (2, 3):
        validate(f"int8 margin={m} vs margin=6", int8_fn(m), int8_fn(6))

    # int8 full-dispatch recall vs f32 brute force (host; ~10 s matmul)
    got = np.asarray(int8_fn(2)(qs[0])[1])
    q0 = qh[0]
    d_full = (q0**2).sum(1)[:, None] - 2.0 * q0 @ xh.T + (xh**2).sum(1)[None, :]
    ref = np.argpartition(d_full, K, axis=1)[:, :K]
    inter = np.mean([len(set(a) & set(b)) / K for a, b in zip(got.tolist(), ref.tolist())])
    print(f"int8 margin=2 recall@10 vs f32 brute force over {Q} queries: {inter:.5f}",
          flush=True)


if __name__ == "__main__":
    main()
