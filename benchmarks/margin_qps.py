"""Margin 0/1/2 QPS at the bench operating point, certificate ON.

Runs on the real TPU (1M x 128 bf16 store). Motivation: the runtime
certificate + topk_twophase_safe escalation make small margins safe to
ship, and the fused path measured 0 trips / 0 mismatches at margins
0/1/2 over 40960 Gaussian queries — margin 1 cuts phase-2 gather
traffic ~8%, margin 0 ~17%. If clean AND faster, re-pin bench.py.

    python benchmarks/margin_qps.py

The runtime certificate (cert trips -> wide-margin re-run) makes small
margins safe to ship; this measures what they buy. Protocol: bench.py's
(100 dependent-free dispatches, one readback, RTT subtracted).
"""
import sys, time, json
sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parent.parent))
import numpy as np
import jax, jax.numpy as jnp
from image_search_engine_tpu.ops.topk_pallas import topk_twophase

N, D, Q, K, ITERS = 1_000_000, 128, 2048, 10, 100
rng = np.random.default_rng(0)
xh = rng.standard_normal((N, D)).astype(np.float32)
x = jnp.asarray(xh, jnp.bfloat16)
xb32 = np.asarray(x, np.float32)
xn = jnp.asarray(np.sum(xb32 * xb32, axis=1))
del xb32
qh = rng.standard_normal((ITERS, Q, D)).astype(np.float32)
qs = [jnp.asarray(qh[i]) for i in range(ITERS)]

tiny = jax.jit(lambda v: v + 1.0)
_ = np.asarray(tiny(jnp.zeros((8, 128))))
t0 = time.time()
for _ in range(3):
    _ = np.asarray(tiny(jnp.zeros((8, 128))))
rtt = (time.time() - t0) / 3

for margin in (2, 1, 0):
    def fn(q, m=margin):
        return topk_twophase(q, x, K, "l2", x_norms=xn, tile_n=4096,
                             t_margin=m, with_certificate=True)
    t0 = time.time()
    d, i, cert = fn(qs[0])
    _ = np.asarray(d)
    compile_s = time.time() - t0
    t0 = time.time()
    certs = []
    for it in range(ITERS):
        d, i, cert = fn(qs[it])
        certs.append(cert)
    _ = np.asarray(d)
    el = max(time.time() - t0 - rtt, 1e-9)
    trips = sum(int((~np.asarray(c)).sum()) for c in certs)
    print(json.dumps({"margin": margin, "qps": round(ITERS * Q / el),
                      "ms": round(1000 * el / ITERS, 2),
                      "cert_trips": trips, "of": ITERS * Q,
                      "compile_s": round(compile_s, 1)}), flush=True)
