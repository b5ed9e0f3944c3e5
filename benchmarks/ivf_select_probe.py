"""Probed-scan select stage A/B at the 1M operating point (VERDICT r4
next #2): does the flat path's Pallas t-pass select (``_select_topt``)
pay inside ``ivf_probed_topk``?

Three measurements per (Q, nprobe):
  * truncated program — probed-scan scores only (reduced to a scalar on
    device), isolating the select stage's share of the full dispatch;
  * full dispatch, select_impl="xla"  (lax.top_k over (Q, nprobe*cap));
  * full dispatch, select_impl="pallas" (scores.T + t-pass extract-min —
    NOTE the transpose: the probed scan emits query-major scores, unlike
    the flat phase 1 whose group-major mins the select consumes free).

Protocol: bench.py's — compile the EXACT program timed, N dependent-free
dispatches, one small readback to drain, tunnel RTT measured and
subtracted. Same 4096-tight-center corpus as ivf_batched_1m.py.

    python benchmarks/ivf_select_probe.py
"""

from __future__ import annotations

import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

N, D, NLIST, K = 1_000_000, 128, 1024, 10


def main():
    import jax
    import jax.numpy as jnp

    from image_search_engine_tpu.index.ivf import IVFIndex
    from image_search_engine_tpu.utils import compile_cache

    compile_cache.enable()
    assert jax.default_backend() == "tpu"
    rng = np.random.default_rng(0)
    centers = rng.standard_normal((4096, D)).astype(np.float32) * 3
    x = np.concatenate([
        c + rng.standard_normal((N // 4096, D)).astype(np.float32)
        for c in centers
    ])[:N]
    q = x[rng.choice(len(x), 2048, replace=False)] + 0.1 * rng.standard_normal(
        (2048, D)).astype(np.float32)

    t0 = time.time()
    ivf = IVFIndex(nlist=NLIST, nprobe=4, table_dtype="bf16").add(x)
    print(f"build {time.time()-t0:.1f}s; buckets {ivf.lists.shape} "
          f"(cap {ivf.lists.shape[1]})", flush=True)
    nprobe_eff = ivf._effective_nprobe()
    bcents, lists, _, packed, pnorms = ivf._device_arrays()

    tiny = jax.jit(lambda v: v + 1.0)
    _ = np.asarray(tiny(jnp.zeros((8, 128))))
    t0 = time.time()
    for _ in range(5):
        _ = np.asarray(tiny(jnp.zeros((8, 128))))
    rtt = (time.time() - t0) / 5
    print(f"rtt {rtt*1e3:.1f} ms", flush=True)

    from image_search_engine_tpu.ops.ivf_pallas import ivf_probed_topk

    # truncated program: scan scores only, drained via a scalar reduce
    # (never return the big intermediate — BENCH_NOTES measurement trap)
    @functools.partial(jax.jit, static_argnames=("nprobe",))
    def scan_only(qj, bc, pk, pn, ls, nprobe):
        d, i, ok = ivf_probed_topk(qj, bc, pk, pn, ls, 1, nprobe)
        del i, ok
        return jnp.sum(d)

    def timed(fn, reps):
        out = fn()
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
        t0 = time.time()
        for _ in range(reps):
            out = fn()
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
        return max((time.time() - t0 - rtt) / reps, 1e-9)

    for qn in (1024, 2048):
        qj = jnp.asarray(ivf._prep(q[:qn]))
        res = {}
        for impl in ("xla", "pallas"):
            el = timed(lambda: ivf_probed_topk(
                qj, bcents, packed, pnorms, lists, K, nprobe_eff,
                select_impl=impl), reps=20)
            res[impl] = el
            print(f"Q={qn} select={impl}: {el*1e3:.2f} ms/dispatch -> "
                  f"{qn/el/1e3:.1f}k QPS", flush=True)
        # id parity between the two selects on this dispatch
        d1, i1, _ = ivf_probed_topk(qj, bcents, packed, pnorms, lists, K,
                                    nprobe_eff, select_impl="xla")
        d2, i2, _ = ivf_probed_topk(qj, bcents, packed, pnorms, lists, K,
                                    nprobe_eff, select_impl="pallas")
        i1, i2 = np.asarray(i1), np.asarray(i2)
        mism = sum(set(a) != set(b) for a, b in
                   zip(i1.tolist(), i2.tolist()))
        print(f"Q={qn} id-set mismatches xla-vs-pallas: {mism}/{qn}",
              flush=True)
        print(f"Q={qn} pallas/xla dispatch ratio: "
              f"{res['pallas']/res['xla']:.3f}", flush=True)

    # select share: truncated-vs-full split at Q=2048
    qj = jnp.asarray(ivf._prep(q[:2048]))
    el_scan = timed(lambda: scan_only(qj, bcents, packed, pnorms, lists,
                                      nprobe_eff), reps=20)
    print(f"Q=2048 truncated scan(+k=1 select) program: "
          f"{el_scan*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
