"""Cost + trip-rate of the runtime exactness certificate at the headline
operating point (1M x 128 bf16, Q=2048, k=10, fused, margin 2).

Measures QPS with and without ``with_certificate`` (requirement: <2%
cost), the trip rate over ITERS*Q Gaussian queries at the shipped margin
(expected 0 — margin 2 was validated 0/40960), and the trip rate at
margins 0/1 (where the margin-validation sweeps measured 1538/67
mismatches per 40960 — the certificate must catch at least those).

    python benchmarks/certificate_cost.py
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

    from image_search_engine_tpu.ops.topk_pallas import topk_twophase

    assert jax.default_backend() == "tpu"

    rng = np.random.default_rng(0)
    xh = rng.standard_normal((N, D)).astype(np.float32)
    x = jnp.asarray(xh, jnp.bfloat16)
    xb32 = np.asarray(x, np.float32)
    xn = jnp.asarray(np.sum(xb32 * xb32, axis=1))
    qh = rng.standard_normal((ITERS, Q, D)).astype(np.float32)
    qs = [jnp.asarray(qh[i]) for i in range(ITERS)]

    def fn(q, m, cert):
        return topk_twophase(q, x, K, "l2", x_norms=xn, tile_n=TILE_N,
                             t_margin=m, fused_rescore=True,
                             with_certificate=cert)

    # trip rates: margins 0/1 must catch the known mismatch population;
    # the shipped margin 2 should be clean
    for m in (0, 1, 2):
        trips = 0
        mism = 0
        for it in range(ITERS):
            out = fn(qs[it], m, True)
            cert = np.asarray(out[2])
            trips += int((~cert).sum())
            i6 = np.asarray(fn(qs[it], 6, False)[1])
            im = np.asarray(out[1])
            bad = ~(np.sort(i6, 1) == np.sort(im, 1)).all(1)
            mism += int(bad.sum())
            # soundness on hardware: a mismatched query must not be certified
            falsely_ok = int((bad & cert).sum())
            if falsely_ok:
                print(f"  !! m{m} iter {it}: {falsely_ok} mismatched-but-"
                      f"certified queries", flush=True)
        print(f"margin {m}: certificate trips {trips} / {ITERS*Q}, "
              f"actual mismatches vs m6 {mism} / {ITERS*Q}", flush=True)

    # timing: certificate on vs off at the shipped margin
    tiny = jax.jit(lambda v: v + 1.0)
    _ = np.asarray(tiny(jnp.zeros((8, 128))))
    t0 = time.time()
    for _ in range(3):
        _ = np.asarray(tiny(jnp.zeros((8, 128))))
    rtt = (time.time() - t0) / 3
    qps = {}
    for cert in (False, True):
        out = fn(qs[0], 2, cert)
        _ = np.asarray(out[0])
        t0 = time.time()
        for it in range(ITERS):
            out = fn(qs[it], 2, cert)
        _ = np.asarray(out[0])
        el = max(time.time() - t0 - rtt, 1e-9)
        qps[cert] = ITERS * Q / el
        print(f"cert={cert}: {el/ITERS*1e3:.2f} ms/dispatch, "
              f"{qps[cert]/1e3:.1f}k QPS", flush=True)
    print(f"certificate cost: {(1 - qps[True]/qps[False])*100:.2f}%", flush=True)


if __name__ == "__main__":
    main()
