"""Round 3: margin validation at scale + int8 sweep with int8 rescore.

rescore_variants2.py: G=128 t=k+1 -> 150.2k QPS (recall 1.000 on the spot
check). Before adopting a tight margin as default, validate it properly:
compare t=k+1 (and t=k) against t=k+4 over ALL dispatched queries (40960)
— both are exact over the bf16 store, so any index mismatch that isn't a
genuine distance tie means the margin dropped a covering group.

Also: int8 store variant whose phase-2 rescore runs on the int8 codes
directly (int8 x int8 -> int32 einsum, scale epilogue) — the current int8
path dequantizes gathered candidates to f32, materializing (Q, t*128, d)
f32, which is why int8 only measured +8%.

    python benchmarks/rescore_variants3.py
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
    from image_search_engine_tpu.parallel.topk import PAD_NORM

    assert jax.default_backend() == "tpu", "run on the TPU"

    rng = np.random.default_rng(0)
    xh = rng.standard_normal((N, D)).astype(np.float32)
    x = jnp.asarray(xh, jnp.bfloat16)
    xn = jnp.sum(jnp.asarray(xh) * jnp.asarray(xh), axis=1)
    qh = rng.standard_normal((ITERS, Q, D)).astype(np.float32)
    qs = [jnp.asarray(qh[i]) for i in range(ITERS)]

    codes, scales = tp.quantize_store_int8(jnp.asarray(xh))
    deq = np.asarray(codes, np.float32) * np.asarray(scales)[:, None]
    xn_int8 = jnp.asarray(np.sum(deq * deq, axis=1))

    q8 = qh[0][:8].astype(np.float64)
    x64 = xh.astype(np.float64)
    d64 = (q8**2).sum(1)[:, None] - 2.0 * q8 @ x64.T + (x64**2).sum(1)[None, :]
    ref_i = np.argsort(d64, axis=1)[:, :K]

    def recall(idx):
        got = np.asarray(idx)[:8]
        return float(np.mean([len(set(a) & set(b)) / K
                              for a, b in zip(got.tolist(), ref_i.tolist())]))

    tile_n = 4096
    npad = tp.round_up(N, tile_n)
    GROUP = 128
    ngroups = npad // GROUP

    # ---- bf16 variant (margin parametrized), bf16 rescore ------------------
    @functools.partial(jax.jit, static_argnames=("t_margin",))
    def twophase_bf16(q, x, xnorms, *, t_margin):
        qn_rows, d = q.shape
        dp = tp.round_up(d, 128)
        qp = tp.round_up(qn_rows, 16)
        qf = jnp.pad(q.astype(jnp.bfloat16), ((0, qp - qn_rows), (0, dp - d)))
        xf = jnp.pad(x, ((0, npad - N), (0, dp - d)))
        norms = jnp.pad(xnorms, (0, npad - N), constant_values=PAD_NORM)
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
            out_specs=pl.BlockSpec((tile_n // GROUP, qp), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((ngroups, qp), jnp.float32),
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_bytes),
        )(qf, norms, xf).T
        t = min(K + t_margin, ngroups)
        _, cand_groups = jax.lax.top_k(-mins[:qn_rows], t)
        offsets = jnp.arange(GROUP, dtype=jnp.int32)
        flat_ids = (cand_groups[..., None] * GROUP + offsets).reshape(qn_rows, t * GROUP)
        vecs = xf.reshape(ngroups, GROUP, dp)[cand_groups].reshape(qn_rows, t * GROUP, dp)
        cn = norms.reshape(ngroups, GROUP)[cand_groups].reshape(qn_rows, t * GROUP)
        cross = jnp.einsum("qd,qcd->qc", qf[:qn_rows], vecs,
                           preferred_element_type=jnp.float32)
        dist = cn - 2.0 * cross
        vals, pos = jax.lax.top_k(-dist, K)
        ids = jnp.take_along_axis(flat_ids, pos, axis=1)
        qnorm = jnp.sum(q.astype(jnp.float32) * q, axis=1, keepdims=True)
        return jnp.maximum(-vals + qnorm, 0.0), ids

    # ---- int8 variant: int8 sweep + int8 einsum rescore ---------------------
    @functools.partial(jax.jit, static_argnames=("t_margin",))
    def twophase_int8(q, codes, scales, xnorms, *, t_margin):
        qn_rows, d = q.shape
        dp = tp.round_up(d, 128)
        qp = tp.round_up(qn_rows, 128)
        q32 = q.astype(jnp.float32)
        sq = jnp.maximum(jnp.max(jnp.abs(q32), axis=1), 1e-12) / 127.0
        q_int = jnp.clip(jnp.round(q32 / sq[:, None]), -127, 127).astype(jnp.int8)
        qf = jnp.pad(q_int, ((0, qp - qn_rows), (0, dp - d)))
        qs_pad = jnp.pad(sq, (0, qp - qn_rows))
        xf = jnp.pad(codes, ((0, npad - N), (0, dp - d)))
        scale_pad = jnp.pad(scales, (0, npad - N))
        norms = jnp.pad(xnorms, (0, npad - N), constant_values=PAD_NORM)
        vmem_bytes = min(int(1.5 * (qp * tile_n * 4 + 2 * tile_n * dp
                                    + qp * dp * 4)) + (1 << 20), 112 << 20)
        mins = pl.pallas_call(
            functools.partial(tp._groupmin_kernel_q8, tile_n=tile_n),
            grid=(npad // tile_n,),
            in_specs=[
                pl.BlockSpec((qp, dp), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((qp,), lambda i: (0,), memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_n,), lambda i: (i,), memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_n,), lambda i: (i,), memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_n, dp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tile_n // GROUP, qp), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((ngroups, qp), jnp.float32),
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_bytes),
        )(qf, qs_pad, norms, scale_pad, xf).T
        t = min(K + t_margin, ngroups)
        _, cand_groups = jax.lax.top_k(-mins[:qn_rows], t)
        offsets = jnp.arange(GROUP, dtype=jnp.int32)
        flat_ids = (cand_groups[..., None] * GROUP + offsets).reshape(qn_rows, t * GROUP)
        vecs = xf.reshape(ngroups, GROUP, dp)[cand_groups].reshape(qn_rows, t * GROUP, dp)
        cn = norms.reshape(ngroups, GROUP)[cand_groups].reshape(qn_rows, t * GROUP)
        csc = scale_pad.reshape(ngroups, GROUP)[cand_groups].reshape(qn_rows, t * GROUP)
        # int8 x int8 -> int32 on the MXU; dequant in the tiny (Q, t*G) epilogue
        cross_i = jnp.einsum("qd,qcd->qc", qf[:qn_rows], vecs,
                             preferred_element_type=jnp.int32)
        cross = cross_i.astype(jnp.float32) * (sq[:, None] * csc)
        dist = cn - 2.0 * cross
        vals, pos = jax.lax.top_k(-dist, K)
        ids = jnp.take_along_axis(flat_ids, pos, axis=1)
        qnorm = jnp.sum(q.astype(jnp.float32) * q, axis=1, keepdims=True)
        return jnp.maximum(-vals + qnorm, 0.0), ids

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

    # timing
    run("bf16 t=k+0", lambda q: twophase_bf16(q, x, xn, t_margin=0))
    run("bf16 t=k+1", lambda q: twophase_bf16(q, x, xn, t_margin=1))
    run("int8 t=k+1 int8-rescore",
        lambda q: twophase_int8(q, codes, scales, xn_int8, t_margin=1))
    run("int8 t=k+2 int8-rescore",
        lambda q: twophase_int8(q, codes, scales, xn_int8, t_margin=2))

    # margin validation vs t=k+4 over all 40960 queries (sets must match up
    # to genuine distance ties, detected via the returned distances)
    for margin, name in ((0, "t=k+0"), (1, "t=k+1")):
        mism = ties = 0
        for it in range(ITERS):
            d_ref, i_ref = twophase_bf16(qs[it], x, xn, t_margin=4)
            d_m, i_m = twophase_bf16(qs[it], x, xn, t_margin=margin)
            i_ref = np.asarray(i_ref); i_m = np.asarray(i_m)
            d_ref = np.asarray(d_ref); d_m = np.asarray(d_m)
            neq = ~(np.sort(i_ref, 1) == np.sort(i_m, 1)).all(1)
            for qi in np.nonzero(neq)[0]:
                if abs(d_ref[qi, K - 1] - d_m[qi, K - 1]) <= 1e-6 * max(1.0, abs(d_ref[qi, K - 1])):
                    ties += 1
                else:
                    mism += 1
        print(f"validation {name} vs t=k+4 over {ITERS*Q} queries: "
              f"{mism} real mismatches, {ties} boundary ties", flush=True)


if __name__ == "__main__":
    main()
