"""Prototype: two-level candidate selection for topk_twophase.

Current phase 2 rescans t = k+4 GROUPS of 128 rows per query (458 KB/query
of gather traffic at d=128 bf16). Variant A emits width-32 SUBGROUP mins
from the phase-1 kernel (bf16, query-major) alongside the f32 group mins;
selection then narrows 128-wide groups -> 32-wide subgroups before the
vector gather (114 KB/query). Exactness argument per level: any group /
subgroup holding a true top-k element has min <= the k-th global distance,
and at most k can, so the k+4 best cover the answer (margin for ties).

Measures QPS + recall vs NumPy float64 on 1M x 128, comparing the shipped
topk_twophase against the prototype.
"""

from __future__ import annotations

import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 1_000_000
D = 128
K = 10
ITERS = 20
GROUP = 128
SUB = 32


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _kernel_two_level(q_ref, xn_ref, x_ref, gmin_ref, smin_ref, *, tile_n):
    """Distance tile + width-32 subgroup mins (bf16, query-major) and
    width-128 group mins (f32, group-major)."""
    cross = jax.lax.dot_general(
        q_ref[:], x_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (Qp, tile_n)
    scores = xn_ref[:][None, :] - 2.0 * cross
    subs = []
    for s in range(tile_n // SUB):
        subs.append(jnp.min(scores[:, s * SUB : (s + 1) * SUB], axis=1))  # (Qp,)
    # group mins from subgroup mins (4 per group)
    gmins = []
    for g in range(tile_n // GROUP):
        m = subs[4 * g]
        for j in range(1, 4):
            m = jnp.minimum(m, subs[4 * g + j])
        gmins.append(m)
    gmin_ref[:] = jnp.stack(gmins, axis=0)  # (tile_n//GROUP, Qp) f32
    smin_ref[:] = jnp.stack(subs, axis=1).astype(jnp.bfloat16)  # (Qp, tile_n//SUB)


@functools.partial(jax.jit, static_argnames=("k", "tile_n"))
def topk_two_level(q, x, k, x_norms, *, tile_n=4096):
    qn_rows, d = q.shape
    n = x.shape[0]
    dp = _round_up(d, 128)
    qp = _round_up(qn_rows, 16)
    npad = _round_up(n, tile_n)
    ngroups = npad // GROUP
    nsub = npad // SUB

    qf = jnp.pad(q.astype(jnp.bfloat16), ((0, qp - qn_rows), (0, dp - d)))
    xf = jnp.pad(x.astype(jnp.bfloat16), ((0, npad - n), (0, dp - d)))
    norms = jnp.pad(x_norms, (0, npad - n), constant_values=1e30)

    grid = (npad // tile_n,)
    gmins, smins = pl.pallas_call(
        functools.partial(_kernel_two_level, tile_n=tile_n),
        grid=grid,
        in_specs=[
            pl.BlockSpec((qp, dp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, dp), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tile_n // GROUP, qp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((qp, tile_n // SUB), lambda i: (0, i), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((ngroups, qp), jnp.float32),
            jax.ShapeDtypeStruct((qp, nsub), jnp.bfloat16),
        ),
    )(qf, norms, xf)

    # level 1: best k+4 groups per query (f32 mins)
    t1 = min(k + 4, ngroups)
    _, cand_groups = jax.lax.top_k(-gmins.T[:qn_rows], t1)  # (Q, t1)

    # level 2: best k+4 subgroups among the 4*t1 candidates (bf16 mins)
    sub_ids = (cand_groups[..., None] * 4 + jnp.arange(4, dtype=jnp.int32)).reshape(
        qn_rows, 4 * t1
    )  # (Q, 4*t1) global subgroup ids
    sub_vals = jnp.take_along_axis(
        smins[:qn_rows].astype(jnp.float32), sub_ids, axis=1
    )  # (Q, 4*t1)
    t2 = min(k + 4, 4 * t1)
    _, pos = jax.lax.top_k(-sub_vals, t2)
    cand_subs = jnp.take_along_axis(sub_ids, pos, axis=1)  # (Q, t2)

    # gather candidate blocks (t2 x 32 rows) and rescore exactly
    offsets = jnp.arange(SUB, dtype=jnp.int32)
    flat_ids = (cand_subs[..., None] * SUB + offsets).reshape(qn_rows, t2 * SUB)
    vecs = xf.reshape(nsub, SUB, dp)[cand_subs].reshape(qn_rows, t2 * SUB, dp)
    cn = norms.reshape(nsub, SUB)[cand_subs].reshape(qn_rows, t2 * SUB)
    cross = jnp.einsum("qd,qcd->qc", qf[:qn_rows], vecs,
                       preferred_element_type=jnp.float32)
    dist = cn - 2.0 * cross
    vals, pos2 = jax.lax.top_k(-dist, k)
    ids = jnp.take_along_axis(flat_ids, pos2, axis=1)
    qnorm = jnp.sum(q.astype(jnp.float32) * q, axis=1, keepdims=True)
    return jnp.maximum(-vals + qnorm, 0.0), ids


def main():
    from image_search_engine_tpu.ops.topk_pallas import topk_twophase

    rng = np.random.default_rng(0)
    xh = rng.standard_normal((N, D)).astype(np.float32)
    x = jnp.asarray(xh, jnp.bfloat16)
    xn = jnp.sum(jnp.asarray(xh) * jnp.asarray(xh), axis=1)

    tiny = jax.jit(lambda v: v + 1.0)
    _ = np.asarray(tiny(jnp.zeros((8, 128))))
    t0 = time.time()
    for _ in range(3):
        _ = np.asarray(tiny(jnp.zeros((8, 128))))
    rtt = (time.time() - t0) / 3

    x64 = xh.astype(np.float64)
    x64n = (x64**2).sum(1)

    for q_batch in (2048, 4096):
        qh = rng.standard_normal((ITERS, q_batch, D)).astype(np.float32)
        qs = [jnp.asarray(qh[i]) for i in range(ITERS)]
        for name, fn in (
            ("two_level", lambda qq: topk_two_level(qq, x, K, xn)),
            ("shipped", lambda qq: topk_twophase(qq, x, K, "l2", x_norms=xn, tile_n=4096)),
        ):
            try:
                t0 = time.time()
                d, i = fn(qs[0])
                _ = np.asarray(d)
                compile_s = time.time() - t0
            except Exception as e:  # noqa: BLE001
                print(json.dumps({"variant": name, "Q": q_batch, "error": str(e)[:200]}),
                      flush=True)
                continue
            t0 = time.time()
            for it in range(ITERS):
                d, i = fn(qs[it])
            _ = np.asarray(d)
            elapsed = max(time.time() - t0 - rtt, 1e-9)
            qps = ITERS * q_batch / elapsed

            q8 = qh[0][:8].astype(np.float64)
            d64 = (q8**2).sum(1)[:, None] - 2 * q8 @ x64.T + x64n[None, :]
            ref_i = np.argsort(d64, axis=1)[:, :K]
            got_i = np.asarray(fn(qs[0])[1])[:8]
            recall = float(np.mean(
                [len(set(a) & set(b)) / K for a, b in zip(got_i.tolist(), ref_i.tolist())]
            ))
            print(json.dumps({
                "variant": name, "Q": q_batch, "qps": round(qps, 1),
                "ms_per_sweep": round(1000 * elapsed / ITERS, 2),
                "recall@10": recall, "compile_s": round(compile_s, 1),
            }), flush=True)


if __name__ == "__main__":
    main()
