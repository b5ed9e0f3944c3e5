"""Split phase-1's 5.12 ms and attack it: sweep-only timing, approx_max_k
candidate selection, and Q=4096 amortization. See gather_kernel_sweep.py.

    python benchmarks/gather_kernel_sweep2.py
"""

from __future__ import annotations

import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from benchmarks.gather_kernel_proto import K  # noqa: E402

N, D, ITERS, TILE_N = 1_000_000, 128, 20, 4096


def build_variant(N, D, tile_n, t_margin, *, QB=8, select="exact",
                  stop_after=None, recall_target=0.95):
    """stop_after: None | 'sweep' | 'select'."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from image_search_engine_tpu.ops import topk_pallas as tp
    from image_search_engine_tpu.parallel.topk import PAD_NORM

    GROUP = tp.GROUP
    POS_INF = float("inf")
    npad = tp.round_up(N, tile_n)
    ngroups = npad // GROUP
    t = K + t_margin

    def rescore_kernel(cand_ref, *refs, t, n_valid):
        q_ref = refs[0]
        x_refs = refs[1 : 1 + QB]
        out_ref = refs[1 + QB]
        i = pl.program_id(0)
        jt = pl.program_id(1)
        col_iota = jax.lax.broadcasted_iota(jnp.int32, (1, GROUP), 1)
        for j in range(QB):
            xb = x_refs[j][:]
            xb32 = xb.astype(jnp.float32)
            nb = jnp.sum(xb32 * xb32, axis=1)
            cross = jax.lax.dot_general(
                q_ref[j][None, :], xb,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            gid = cand_ref[(i * QB + j) * t + jt]
            valid = gid * GROUP + col_iota < n_valid
            out_ref[j, :] = jnp.where(valid, nb[None, :] - 2.0 * cross, POS_INF)[0]

    @jax.jit
    def fn(q, x, xnorms):
        qn_rows, d = q.shape
        dp = tp.round_up(d, 128)
        qp = tp.round_up(qn_rows, max(16, QB))
        qf = jnp.pad(q.astype(x.dtype), ((0, qp - qn_rows), (0, dp - d)))
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
        )(qf, norms, xf)
        if stop_after == "sweep":
            s = jnp.sum(mins)
            return s[None, None], s[None, None].astype(jnp.int32)
        mins = mins.T

        if select == "approx":
            _, cand_groups = jax.lax.approx_max_k(
                -mins[:qp], t, recall_target=recall_target
            )
        else:
            _, cand_groups = jax.lax.top_k(-mins[:qp], t)
        cand_groups = cand_groups.astype(jnp.int32)
        if stop_after == "select":
            return cand_groups.astype(jnp.float32), cand_groups
        cand_flat = cand_groups.reshape(-1)

        def x_map(j):
            return lambda i, jt, cand: (cand[(i * QB + j) * t + jt], 0)

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(qp // QB, t),
            in_specs=[
                pl.BlockSpec((QB, dp), lambda i, jt, cand: (i, 0)),
                *[pl.BlockSpec((GROUP, dp), x_map(j)) for j in range(QB)],
            ],
            out_specs=pl.BlockSpec((QB, GROUP), lambda i, jt, cand: (i, jt)),
        )
        scores = pl.pallas_call(
            functools.partial(rescore_kernel, t=t, n_valid=N),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((qp, t * GROUP), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=min(
                    int(3.0 * QB * (GROUP * dp * xf.dtype.itemsize + GROUP * 4))
                    + (4 << 20), 112 << 20)
            ),
        )(cand_flat, qf, *([xf] * QB))

        scores = scores[:qn_rows]
        offsets = jnp.arange(GROUP, dtype=jnp.int32)
        flat_ids = (cand_groups[:qn_rows, :, None] * GROUP + offsets).reshape(
            qn_rows, t * GROUP)
        vals, pos = jax.lax.top_k(-scores, K)
        ids = jnp.take_along_axis(flat_ids, pos, axis=1)
        qnorm = jnp.sum(q.astype(jnp.float32) * q, axis=1, keepdims=True)
        return jnp.maximum(-vals + qnorm, 0.0), ids

    return fn


def main():
    import jax
    import jax.numpy as jnp

    assert jax.default_backend() == "tpu"

    rng = np.random.default_rng(0)
    xh = rng.standard_normal((N, D)).astype(np.float32)
    x = jnp.asarray(xh, jnp.bfloat16)
    xb32 = np.asarray(x, np.float32)
    xn = jnp.asarray(np.sum(xb32 * xb32, axis=1))

    tiny = jax.jit(lambda v: v + 1.0)
    _ = np.asarray(tiny(jnp.zeros((8, 128))))
    t0 = time.time()
    for _ in range(3):
        _ = np.asarray(tiny(jnp.zeros((8, 128))))
    rtt = (time.time() - t0) / 3

    # f32 brute-force reference for recall (first dispatch of Q=2048)
    def make_queries(Q):
        qh = rng.standard_normal((ITERS, Q, D)).astype(np.float32)
        return qh, [jnp.asarray(qh[i]) for i in range(ITERS)]

    qh2048, qs2048 = make_queries(2048)
    q0 = qh2048[0]
    d_full = (q0**2).sum(1)[:, None] - 2.0 * q0 @ xh.T + (xh**2).sum(1)[None, :]
    ref = np.argpartition(d_full, K, axis=1)[:, :K]

    def rec(idx):
        return float(np.mean([len(set(a) & set(b)) / K
                              for a, b in zip(idx.tolist(), ref.tolist())]))

    def timeit(name, fn, qs, Q, check_recall=False):
        d, i = fn(qs[0], x, xn)
        _ = np.asarray(d)
        t0 = time.time()
        for it in range(ITERS):
            d, i = fn(qs[it], x, xn)
        _ = np.asarray(d)
        el = max(time.time() - t0 - rtt, 1e-9)
        msg = f"{name}: {el/ITERS*1e3:.2f} ms/dispatch, {ITERS*Q/el/1e3:.1f}k QPS"
        if check_recall:
            msg += f", recall@10={rec(np.asarray(fn(qs[0], x, xn)[1])):.5f}"
        print(msg, flush=True)

    timeit("sweep-only", build_variant(N, D, TILE_N, 2, stop_after="sweep"),
           qs2048, 2048)
    timeit("sweep+select(exact)", build_variant(N, D, TILE_N, 2, stop_after="select"),
           qs2048, 2048)
    timeit("sweep+select(approx .95)",
           build_variant(N, D, TILE_N, 2, select="approx", stop_after="select"),
           qs2048, 2048)
    timeit("fused m3 approx.95",
           build_variant(N, D, TILE_N, 3, select="approx"),
           qs2048, 2048, check_recall=True)
    timeit("fused m2 exact (ref)",
           build_variant(N, D, TILE_N, 2), qs2048, 2048, check_recall=True)

    qh4096, qs4096 = make_queries(4096)
    timeit("fused m2 Q=4096 tile=2048",
           build_variant(N, D, 2048, 2), qs4096, 4096)


if __name__ == "__main__":
    main()
