"""Phase-2 rescore variants for topk_twophase, measured on the real chip.

Hypothesis: the rescore einsum `qd,qcd->qc` with f32 queries x bf16
gathered candidates forces XLA to upcast+materialize the (Q, t*128, d)
candidate tensor in f32 (~1.9 GB at Q=2048) — the actual plateau term.
A bf16 x bf16 -> f32-accum rescore is mathematically identical over a
bf16 store (bf16 products are exact in f32) and skips that copy.

Variants:
  v0  current topk_twophase (baseline, bf16 store)
  v1  bf16 rescore (q cast to bf16, candidates stay bf16)
  v2  v1 + t = k+2 (smaller candidate margin)

Usage: python benchmarks/rescore_variants.py
"""

from __future__ import annotations

import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

N, D, Q, K, ITERS = 1_000_000, 128, 2048, 10, 20


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from image_search_engine_tpu.ops import topk_pallas as tp

    assert jax.default_backend() == "tpu", "run on the TPU"

    rng = np.random.default_rng(0)
    xh = rng.standard_normal((N, D)).astype(np.float32)
    x = jnp.asarray(xh, jnp.bfloat16)
    xn = jnp.sum(jnp.asarray(xh) * jnp.asarray(xh), axis=1)
    qh = rng.standard_normal((ITERS, Q, D)).astype(np.float32)
    qs = [jnp.asarray(qh[i]) for i in range(ITERS)]

    # float64 reference on 8 queries for recall
    q8 = qh[0][:8].astype(np.float64)
    x64 = xh.astype(np.float64)
    d64 = (q8**2).sum(1)[:, None] - 2.0 * q8 @ x64.T + (x64**2).sum(1)[None, :]
    ref_i = np.argsort(d64, axis=1)[:, :K]

    def recall(idx):
        got = np.asarray(idx)[:8]
        return float(np.mean([len(set(a) & set(b)) / K
                              for a, b in zip(got.tolist(), ref_i.tolist())]))

    GROUP = tp.GROUP
    tile_n = 4096
    npad = tp.round_up(N, tile_n)
    ngroups = npad // GROUP

    @functools.partial(jax.jit, static_argnames=("t_margin", "bf16_rescore"))
    def twophase_var(q, x, xnorms, *, t_margin, bf16_rescore):
        qn_rows, d = q.shape
        dp = tp.round_up(d, 128)
        qp = tp.round_up(qn_rows, 16)
        qf = jnp.pad(q.astype(jnp.bfloat16), ((0, qp - qn_rows), (0, dp - d)))
        xf = jnp.pad(x, ((0, npad - N), (0, dp - d)))
        from image_search_engine_tpu.parallel.topk import PAD_NORM
        norms = jnp.pad(xnorms, (0, npad - N), constant_values=PAD_NORM)

        out_spec = pl.BlockSpec((tile_n // GROUP, qp), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)
        vmem_bytes = min(int(1.5 * (qp * tile_n * 4 + 2 * tile_n * dp * 2
                                    + qp * dp * 4)) + (1 << 20), 112 << 20)
        mins = pl.pallas_call(
            functools.partial(tp._groupmin_kernel, tile_n=tile_n),
            grid=(npad // tile_n,),
            in_specs=[
                pl.BlockSpec((qp, dp), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_n,), lambda i: (i,), memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_n, dp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((ngroups, qp), jnp.float32),
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_bytes),
        )(qf, norms, xf).T  # (Qp, ngroups)

        t = min(K + t_margin, ngroups)
        _, cand_groups = jax.lax.top_k(-mins[:qn_rows], t)
        offsets = jnp.arange(GROUP, dtype=jnp.int32)
        flat_ids = (cand_groups[..., None] * GROUP + offsets).reshape(qn_rows, t * GROUP)
        vecs = xf.reshape(ngroups, GROUP, dp)[cand_groups].reshape(qn_rows, t * GROUP, dp)
        cn = norms.reshape(ngroups, GROUP)[cand_groups].reshape(qn_rows, t * GROUP)
        if bf16_rescore:
            cross = jnp.einsum("qd,qcd->qc", qf[:qn_rows], vecs,
                               preferred_element_type=jnp.float32)
        else:
            cross = jnp.einsum("qd,qcd->qc", q.astype(jnp.float32), vecs,
                               preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGHEST)
        dist = cn - 2.0 * cross
        vals, pos = jax.lax.top_k(-dist, K)
        ids = jnp.take_along_axis(flat_ids, pos, axis=1)
        qnorm = jnp.sum(q.astype(jnp.float32) * q, axis=1, keepdims=True)
        return jnp.maximum(-vals + qnorm, 0.0), ids

    # RTT
    tiny = jax.jit(lambda v: v + 1.0)
    _ = np.asarray(tiny(jnp.zeros((8, 128))))
    t0 = time.time()
    for _ in range(3):
        _ = np.asarray(tiny(jnp.zeros((8, 128))))
    rtt = (time.time() - t0) / 3

    def run(name, fn):
        d, i = fn(qs[0])
        _ = np.asarray(d)
        t0 = time.time()
        for it in range(ITERS):
            d, i = fn(qs[it])
        _ = np.asarray(d)
        el = max(time.time() - t0 - rtt, 1e-9)
        r = recall(fn(qs[0])[1])
        print(f"{name}: {el/ITERS*1e3:.2f} ms/dispatch, "
              f"{ITERS*Q/el/1e3:.1f}k QPS, recall@10={r:.3f}", flush=True)

    run("v0 current", lambda q: tp.topk_twophase(q, x, K, "l2", x_norms=xn, tile_n=4096))
    run("v1 bf16-rescore t=k+4",
        lambda q: twophase_var(q, x, xn, t_margin=4, bf16_rescore=True))
    run("v2 bf16-rescore t=k+2",
        lambda q: twophase_var(q, x, xn, t_margin=2, bf16_rescore=True))


if __name__ == "__main__":
    main()
