"""Single-query IVFPQ serving latency: fused engine program vs the
generic sequence it replaced.

The engine now serves IVFPQ through ONE jitted program (preprocess +
CNN embed + probed scan over a resident bf16 reconstruction table +
optional exact rerank) with a single device_get per query
(engine.py `fused_pq`). The generic path it replaced paid an embed
dispatch + readback, then `IVFPQIndex.search`'s own query upload and
readbacks — each host hop costs this tunnel's ~30 ms RTT, and real
serving pays the same hop count on any transport.

This bench builds both paths from the SAME index and embedder (the
real resnet-tiny backbone, 2048-D — the dim serving actually uses) and
times warm single-query latency. N is modest (100k) because the probed
scan touches nprobe/nlist of the store regardless of N; hop structure,
embed, and scan dominate single-query latency.

    python benchmarks/serving_fused_ivfpq.py [--n 100000] [--rerank 100]
"""

from __future__ import annotations

import argparse
import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

D, NLIST, NPROBE, M, K = 2048, 256, 8, 16, 10


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--rerank", type=int, default=100)
    ap.add_argument("--reps", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from image_search_engine_tpu.index.ivf import (
        IVFPQIndex, _exact_rescore, _pq_reconstruct_table)
    from image_search_engine_tpu.models.embedder import CNNEmbedder
    from image_search_engine_tpu.ops.image_ops import preprocess_for_cnn
    from image_search_engine_tpu.ops.ivf_pallas import ivf_probed_topk

    assert jax.default_backend() == "tpu"
    rng = np.random.default_rng(0)

    emb = CNNEmbedder("resnet-tiny", image_size=224, batch_size=1)
    img = rng.random((224, 224, 3)).astype(np.float32)
    q_emb = emb.embed_batch(img[None])[0]

    # clustered corpus in the embedder's output space, with K rows PLANTED
    # near the query's embedding — a random Gaussian corpus is unrelated to
    # the query, every candidate is a near-tie, and the id-agreement sanity
    # check below would measure tie-shuffling instead of correctness
    assert args.n >= K, f"--n must be >= {K} (planted rows)"
    per = -(-args.n // 512)  # ceil: keeps small --n smoke runs working
    centers = rng.standard_normal((512, D)).astype(np.float32) * 3
    x = np.concatenate([
        c + rng.standard_normal((per, D)).astype(np.float32)
        for c in centers
    ])[:args.n]
    x[:K] = q_emb[None] + 0.01 * rng.standard_normal((K, D)).astype(np.float32)

    t0 = time.time()
    pq = IVFPQIndex(nlist=NLIST, nprobe=NPROBE, m=M,
                    rerank=args.rerank).add(x)
    print(f"build {time.time()-t0:.1f}s  (N={args.n}, d={D}, m={M}, "
          f"codes {pq.codes.nbytes/1e6:.0f} MB vs raw {x.nbytes/1e6:.0f} MB)",
          flush=True)

    def timed(fn, label):
        fn()  # warm (compile already done by callers)
        t0 = time.time()
        for _ in range(args.reps):
            fn()
        el = (time.time() - t0) / args.reps
        print(f"{label}: {el*1e3:.1f} ms/query", flush=True)
        return el

    # ---- generic sequence the engine used to run: embed dispatch +
    # readback, then IVFPQIndex.search (query upload + its readbacks)
    def generic():
        q = emb.embed_batch(img[None])          # dispatch + device_get
        d, i = pq.search(q, K)                  # upload + readbacks
        return d, i

    generic()  # compile both programs
    t_generic = timed(generic, "generic embed->search")

    # ---- fused program: the exact structure QueryEngine._build creates
    # for IVFPQIndex (engine.py fused_pq) — EVERY index-sized array
    # (bucket centroids, lists, recon table, norms, raw vectors) rides as
    # a jit ARGUMENT, never a closure (closures bake into the compiled
    # program as constants; see engine.py and
    # test_fused_programs_close_over_no_arrays)
    model, norm_name = emb.model, emb.norm_name
    bcents, lists_d, valid_d, pcodes, books = pq._device_arrays_pq()
    recon, rnorms = _pq_reconstruct_table(pcodes, books, bcents, valid_d, pq.m)
    raw_d = jnp.asarray(pq.vectors) if args.rerank else None
    max_list = pq.lists.shape[1]
    pool = pq._effective_nprobe() * max_list

    @functools.partial(jax.jit, static_argnames=("k", "c"))
    def fused_pq(params, batch_stats, images, bcents_t, lists_t, recon_t,
                 rnorms_t, raw_t, k, c):
        xq = preprocess_for_cnn(images, 224, norm=norm_name)
        variables = {"params": params}
        if batch_stats is not None:
            variables["batch_stats"] = batch_stats
        e = model.apply(variables, xq, train=False)
        out = ivf_probed_topk(e, bcents_t, recon_t, rnorms_t, lists_t,
                              c if c else k, NPROBE)
        if c:
            out = _exact_rescore(e, raw_t, out[1], out[2], k)
        return out

    def make_fused(c):
        def fused():
            out = fused_pq(emb.params, emb.batch_stats,
                           jnp.asarray(img[None], jnp.float32),
                           bcents, lists_d, recon, rnorms, raw_d, K, c)
            return jax.device_get(out)          # ONE host transfer
        fused()  # compile
        return fused

    t_adc = timed(make_fused(0), "fused embed+ADC (1 readback)")
    if args.rerank:
        c_eff = min(max(args.rerank, K), pool)
        t_rr = timed(make_fused(c_eff),
                     f"fused embed+ADC+rerank C={args.rerank}")
        # generic runs with the same rerank (constructor default), so this
        # is the like-for-like serving-path comparison
        print(f"speedup vs generic (same rerank semantics): "
              f"{t_generic/t_rr:.2f}x  (ADC-only: {t_generic/t_adc:.2f}x)",
              flush=True)
    else:
        print(f"speedup vs generic: {t_generic/t_adc:.2f}x", flush=True)

    # sanity: both paths must retrieve the planted rows (ids 0..K-1)
    d_ref, i_ref = pq.search(q_emb[None], K, rerank=0)
    out = fused_pq(emb.params, emb.batch_stats,
                   jnp.asarray(img[None], jnp.float32),
                   bcents, lists_d, recon, rnorms, raw_d, K, 0)
    i_fused = np.asarray(out[1])[:, :K]
    planted = set(range(K))
    hit_f = len(planted & set(i_fused[0].tolist()))
    hit_r = len(planted & set(np.asarray(i_ref)[0].tolist()))
    print(f"planted-row hits: fused {hit_f}/{K}, index-search {hit_r}/{K}",
          flush=True)
    assert hit_f == K and hit_r == K


if __name__ == "__main__":
    main()
