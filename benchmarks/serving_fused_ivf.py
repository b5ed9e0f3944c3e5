"""Single-query raw-IVF (cell-probe) serving latency: the fused engine
program vs the generic sequence it replaced — the raw-vector sibling of
benchmarks/serving_fused_ivfpq.py.

The engine serves an unsharded `IVFIndex` through ONE jitted program
(preprocess + CNN embed + probed scan over the packed vector table) with
a single device_get per query (engine.py `fused_ivf`). Every
index-sized array — above all the (nbuckets, cap, d) packed table, GBs
at 1M — rides as a jit ARGUMENT; an earlier version closed over it,
which bakes it into the compiled program as a constant and gets a 1M
program rejected by remote compilation outright. This bench proves the
argument-passing structure compiles and serves at a real scale and
measures what the fusion buys.

    python benchmarks/serving_fused_ivf.py [--n 300000] [--table-dtype bf16]
"""

from __future__ import annotations

import argparse
import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

D, NLIST, NPROBE, K = 2048, 256, 8, 10


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=300_000)
    ap.add_argument("--table-dtype", default="bf16", choices=("f32", "bf16"))
    ap.add_argument("--reps", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from image_search_engine_tpu.index.ivf import IVFIndex, _ivf_search_kernel
    from image_search_engine_tpu.models.embedder import CNNEmbedder
    from image_search_engine_tpu.ops.image_ops import preprocess_for_cnn

    assert jax.default_backend() == "tpu"
    rng = np.random.default_rng(0)

    emb = CNNEmbedder("resnet-tiny", image_size=224, batch_size=1)
    img = rng.random((224, 224, 3)).astype(np.float32)
    q_emb = emb.embed_batch(img[None])[0]

    # clustered corpus with K rows planted near the query embedding (see
    # serving_fused_ivfpq.py: unrelated Gaussian corpora measure
    # tie-shuffling, not retrieval)
    assert args.n >= K, f"--n must be >= {K} (planted rows)"
    per = -(-args.n // 512)  # ceil: keeps small --n smoke runs working
    centers = rng.standard_normal((512, D)).astype(np.float32) * 3
    x = np.concatenate([
        c + rng.standard_normal((per, D)).astype(np.float32)
        for c in centers
    ])[:args.n]
    x[:K] = q_emb[None] + 0.01 * rng.standard_normal((K, D)).astype(np.float32)

    t0 = time.time()
    ivf = IVFIndex(nlist=NLIST, nprobe=NPROBE,
                   table_dtype=args.table_dtype).add(x)
    bcents, lists_d, valid_d, packed_d, pnorms_d = ivf._device_arrays()
    packed_gb = packed_d.size * packed_d.dtype.itemsize / 1e9
    print(f"build {time.time()-t0:.1f}s  (N={args.n}, d={D}, "
          f"packed table {packed_gb:.2f} GB {args.table_dtype})", flush=True)

    def timed(fn, label):
        fn()  # warm
        t0 = time.time()
        for _ in range(args.reps):
            fn()
        el = (time.time() - t0) / args.reps
        print(f"{label}: {el*1e3:.1f} ms/query", flush=True)
        return el

    # ---- generic sequence: embed dispatch + readback, then
    # IVFIndex.search (query upload + readback)
    def generic():
        q = emb.embed_batch(img[None])
        return ivf.search(q, K)

    generic()  # compile both programs
    t_generic = timed(generic, "generic embed->search")

    # ---- fused program: the exact structure QueryEngine._build creates
    # for IVFIndex (engine.py fused_ivf) — all index arrays as arguments
    model, norm_name = emb.model, emb.norm_name
    nprobe = ivf._effective_nprobe()
    max_list = ivf.lists.shape[1]

    @functools.partial(jax.jit, static_argnames=("k",))
    def fused_ivf(params, batch_stats, images, bcents_t, lists_t, valid_t,
                  packed_t, pnorms_t, k):
        xq = preprocess_for_cnn(images, 224, norm=norm_name)
        variables = {"params": params}
        if batch_stats is not None:
            variables["batch_stats"] = batch_stats
        e = model.apply(variables, xq, train=False)
        return _ivf_search_kernel(e, bcents_t, lists_t, valid_t, packed_t,
                                  pnorms_t, k, nprobe, max_list)

    def fused():
        out = fused_ivf(emb.params, emb.batch_stats,
                        jnp.asarray(img[None], jnp.float32),
                        bcents, lists_d, valid_d, packed_d, pnorms_d, K)
        return jax.device_get(out)  # ONE host transfer

    t0 = time.time()
    fused()
    print(f"fused compile+first {time.time()-t0:.1f}s "
          f"(no {packed_gb:.2f} GB constant in the program)", flush=True)
    t_fused = timed(fused, "fused embed+probed-scan (1 readback)")
    print(f"speedup vs generic: {t_generic/t_fused:.2f}x", flush=True)

    # sanity: both paths retrieve the planted rows
    _, i_ref = ivf.search(q_emb[None], K)
    d_f, i_f, ok_f = fused()
    planted = set(range(K))
    hit_f = len(planted & set(np.asarray(i_f)[0, :K].tolist()))
    hit_r = len(planted & set(np.asarray(i_ref)[0, :K].tolist()))
    print(f"planted-row hits: fused {hit_f}/{K}, index-search {hit_r}/{K}",
          flush=True)
    assert hit_f == K and hit_r == K


if __name__ == "__main__":
    main()
