"""IVFPQ at 1M scale: batched ADC search (gather LUT, no one-hot).

Round 1's one-hot ADC materialized (Q, L, m, 256) f32 (~21 MB per query
per probe at this operating point) and OOMed any real batch; the
take_along_axis rewrite is O(Q*L*m). This bench records batched QPS,
single-query latency, recall vs exact flat, and the compression ratio.

    python benchmarks/ivfpq_1m.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

N, D, NLIST, M, K = 1_000_000, 128, 1024, 16, 10


def main():
    import jax
    import jax.numpy as jnp

    from image_search_engine_tpu.index.ivf import IVFPQIndex
    from image_search_engine_tpu.ops.topk_pallas import topk_twophase

    assert jax.default_backend() == "tpu"
    rng = np.random.default_rng(0)
    # clustered corpus (IVF needs structure)
    centers = rng.standard_normal((4096, D)).astype(np.float32) * 3
    x = np.concatenate([
        c + rng.standard_normal((N // 4096, D)).astype(np.float32) for c in centers
    ])[:N]
    q = x[rng.choice(N, 256, replace=False)] + 0.1 * rng.standard_normal(
        (256, D)).astype(np.float32)

    t0 = time.time()
    pq = IVFPQIndex(nlist=NLIST, nprobe=8, m=M).add(x)
    build_s = time.time() - t0
    codes_mb = pq.codes.nbytes / 1e6
    raw_mb = x.nbytes / 1e6
    print(f"build {build_s:.1f}s; codes {codes_mb:.0f} MB vs raw {raw_mb:.0f} MB "
          f"({raw_mb / codes_mb:.0f}x compression)", flush=True)

    # recall vs exact flat (two-phase on chip)
    xn = jnp.asarray((x * x).sum(1))
    ed, ei = topk_twophase(jnp.asarray(q), jnp.asarray(x, jnp.bfloat16), K,
                           "l2", x_norms=jnp.asarray((np.asarray(
                               jnp.asarray(x, jnp.bfloat16), np.float32)**2).sum(1)),
                           tile_n=4096, t_margin=2)[:2]
    ei = np.asarray(ei)

    for qn in (1, 64, 256):
        d, i = pq.search(q[:qn], K)  # compile
        t0 = time.time()
        reps = 20 if qn == 1 else 5
        for _ in range(reps):
            d, i = pq.search(q[:qn], K)
        el = (time.time() - t0) / reps
        if qn == 1:
            print(f"single-query latency: {el*1e3:.2f} ms", flush=True)
        else:
            print(f"batched Q={qn}: {el*1e3:.1f} ms/batch -> {qn/el:.0f} QPS",
                  flush=True)
    _, pi = pq.search(q, K)
    pi = np.asarray(pi)
    rec = np.mean([len(set(a) & set(b)) / K
                   for a, b in zip(pi.tolist(), ei.tolist())])
    # recall@1 is the informative number on this corpus: ranks 2..10 are
    # ~244 near-exact ties among cluster mates, so @10 measures PQ noise
    # re-ranking a lottery, not retrieval quality
    rec1 = float(np.mean(pi[:, 0] == ei[:, 0]))
    rec1_in10 = float(np.mean([ei[j, 0] in set(pi[j].tolist())
                               for j in range(len(ei))]))
    print(f"recall@10 vs exact (Q=256, nprobe=8): {rec:.3f}; "
          f"recall@1: {rec1:.3f}; true-NN in PQ top-10: {rec1_in10:.3f}",
          flush=True)

    # reconstruction-scan batched path (search_batched): decompress codes
    # to a bf16 table per dispatch + fused probed-scan kernel — ADC
    # semantics at raw-IVF scan speed
    qbig = np.concatenate([q] * 4)  # Q=1024
    for name, qs in (("Q=256", q), ("Q=1024", qbig)):
        d, bi = pq.search_batched(qs, K)  # compile
        t0 = time.time()
        for _ in range(5):
            d, bi = pq.search_batched(qs, K)
        el = (time.time() - t0) / 5
        print(f"recon-scan batched {name}: {el*1e3:.1f} ms/batch -> "
              f"{len(qs)/el:.0f} QPS", flush=True)
    bi = np.asarray(bi)[:256]
    brec1 = float(np.mean(bi[:, 0] == ei[:, 0]))
    print(f"recon-scan recall@1: {brec1:.3f}", flush=True)

    # serving mode: reconstruction table cached across dispatches
    # (recon_cache=True) — decompress paid once, scans at raw-IVF speed
    pq.recon_cache = True
    for name, qs in (("Q=256", q), ("Q=1024", qbig)):
        d, ci = pq.search_batched(qs, K)  # compile + populate cache
        t0 = time.time()
        for _ in range(5):
            d, ci = pq.search_batched(qs, K)
        el = (time.time() - t0) / 5
        print(f"recon-cache batched {name}: {el*1e3:.1f} ms/batch -> "
              f"{len(qs)/el:.0f} QPS", flush=True)
    pq.recon_cache = False
    pq._recon_tab = None

    # exact-rerank refine stage: ADC shortlist -> raw-vector rescore.
    # On this tie-heavy corpus this is the measurement that separates
    # "PQ lost the neighbor" from "PQ re-ranked a tie": reranked results
    # are exact over the store for whatever the shortlist contains.
    for c in (50, 100, 200):
        d, ri = pq.search_batched(q, K, rerank=c)  # compile
        t0 = time.time()
        for _ in range(5):
            d, ri = pq.search_batched(q, K, rerank=c)
        el = (time.time() - t0) / 5
        ri = np.asarray(ri)
        rrec = np.mean([len(set(a) & set(b)) / K
                        for a, b in zip(ri.tolist(), ei.tolist())])
        rrec1 = float(np.mean(ri[:, 0] == ei[:, 0]))
        print(f"recon-scan + rerank C={c}: Q=256 {el*1e3:.1f} ms/batch -> "
              f"{256/el:.0f} QPS; recall@10 {rrec:.3f}; recall@1 {rrec1:.3f}",
              flush=True)

    # kernel-level recon-cache scan: device-resident queries, dispatch
    # pipeline, RTT subtracted — the protocol of ivf_batched_1m.py, so
    # the bf16 reconstruction table and the raw f32 IVF table compare
    # apples-to-apples (the search_batched numbers above include a
    # per-call query upload + readback that this dev tunnel dominates).
    from image_search_engine_tpu.ops.ivf_pallas import ivf_probed_topk

    pq.recon_cache = True
    _ = pq.search_batched(q, K)  # populate the cache
    recon, norms = pq._recon_tab
    bcents, lists, _, _, _ = pq._device_arrays_pq()
    tiny = jax.jit(lambda v: v + 1.0)
    _ = np.asarray(tiny(jnp.zeros((8, 128))))
    t0 = time.time()
    for _ in range(3):
        _ = np.asarray(tiny(jnp.zeros((8, 128))))
    rtt = (time.time() - t0) / 3
    for nprobe in (8, 4):
        for qn in (256, 1024):
            qj = jnp.asarray(pq._prep(qbig[:qn]))
            out = ivf_probed_topk(qj, bcents, recon, norms, lists, K, nprobe)
            _ = np.asarray(out[0])
            reps = 10
            t0 = time.time()
            for _ in range(reps):
                out = ivf_probed_topk(qj, bcents, recon, norms, lists, K,
                                      nprobe)
            _ = np.asarray(out[0])
            el = max((time.time() - t0 - rtt) / reps, 1e-9)
            print(f"recon-cache kernel nprobe={nprobe} Q={qn}: "
                  f"{el*1e3:.1f} ms/dispatch -> {qn/el/1e3:.1f}k QPS",
                  flush=True)


if __name__ == "__main__":
    main()
