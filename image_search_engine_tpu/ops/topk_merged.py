"""Merged single-kernel two-phase exact top-k (experimental).

The round-4 speed-of-light accounting (BENCH_NOTES) decomposed the
headline two-phase dispatch at 1M x 128 bf16 / Q=2048 as

    7.69 ms = 2.66 MXU + 1.8 sweep formulation + ~0.25 select
            + 1.0 gather BW + ~1.5 DMA-issue + ~0.4 fixed

and named one untried lever: the phase-2 candidate machinery (~2.5 ms,
DMA-bound) cannot overlap the phase-1 sweep (MXU-bound) across program
boundaries — a TPU core runs one program at a time (cross-dispatch
pipelining measured NEGATIVE, r4) — so overlap requires ONE kernel that
interleaves query-block i's candidate DMAs with query-block i+1's sweep.

This module is that kernel. Structure (grid = (n_qb + 1, n_tiles),
inner dim fastest; all cross-step state in VMEM scratch):

  step (b, j), b < n_qb: SWEEP — auto-pipelined (tile_n, d) store tile j
    against query block b (matmul on the MXU + per-128-column group min,
    the proven phase-1 formulation), mins written into a (ngroups, QB)
    scratch column block;
  step (b, n_tiles-1): SELECT — the flat path's t-pass extract-min
    (ops/topk_pallas._select_topt formulation) over the just-finished
    mins, ids/threshold parked in double-buffered scratch, and the FIRST
    candidate-chunk DMAs for block b issued;
  step (b+1, j): RESCORE — while block b+1's sweep streams, chunk j of
    block b's candidate (GROUP, d) blocks is waited on, rescored against
    the saved query rows, written to the scores output, and chunk j+2's
    DMAs are issued (manual ``pltpu.make_async_copy`` with group ids read
    from the select scratch — BlockSpec index maps cannot depend on
    in-kernel data, which is exactly why the two phases were separate
    programs until now).

The store streams once PER QUERY BLOCK (n_qb x 0.31 ms at 1M bf16 —
cheap under the 2.66 ms MXU term for n_qb <= ~8, which is what makes
the merge viable at all; at n_qb ~ N_tiles it would be the row-gather
regime again). Final top-k over the (Q, t*GROUP) rescored scores, id
reconstruction, and the exactness certificate stay in XLA, identical to
``topk_twophase``'s fused branch.

Scope of the experiment: bf16/f32 stores, l2/ip, k <= 128. Parity: the
candidate-set semantics equal ``topk_twophase(fused_rescore=True,
select_impl="pallas")`` — same group mins, same tie-break-to-lowest
select — so results match the production path exactly wherever scores
are not bf16 near-ties. Measured A/B: benchmarks/merged_twophase.py.

Reference match: faiss.IndexFlatL2/IP.search (backend/utils.py:293-330,
engine.py:55) — BASELINE's "query (knn) must run at speed-of-light".
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from image_search_engine_tpu.ops import round_up
from image_search_engine_tpu.ops.topk_pallas import GROUP, _POS_INF
from image_search_engine_tpu.parallel.topk import PAD_NORM


def _merged_kernel(
    # inputs (auto-pipelined / ANY)
    q_ref,      # (QB, dp) query block b (f32 or store dtype; pre-scaled for ip)
    xn_ref,     # (tile_n,) norms tile j (poisoned at pads)
    x_ref,      # (tile_n, dp) store tile j
    x_hbm,      # (ngroups*GROUP, dp) full store, ANY (candidate DMAs)
    n_hbm,      # (ngroups, GROUP) norms, ANY (candidate DMAs)
    # outputs
    scores_ref,  # (QB, (t+1)*GROUP): t rescored groups + threshold block
    ids_ref,     # (QB, 128) int32: candidate group ids (cols >= t unused)
    # scratch
    mins,        # (ngroups, QB) f32 — block b's group mins
    sel_scratch,  # (ngroups, 128) f32 — select working copy
    ids_buf,     # (2, tp, QB) int32 — double-buffered selected group ids
    ids_smem,    # (2, tp, QB) int32 SMEM — scalar-readable copy (the DMA
                 # engine is the only legal VMEM-vector -> scalar bridge:
                 # dynamic lane reads from VMEM need 128-alignment)
    ids_sem,     # DMA sem for the VMEM->SMEM ids copy
    thr_buf,     # (2, 8, QB) f32 — certificate threshold (row 0)
    qsave,       # (2, QB, dp) — query rows for the rescore side
    cand_buf,    # (2, c, GROUP, dp) store dtype — candidate double buffer
    cnorm_buf,   # (2, c, 1, GROUP) f32
    vec_sems,    # DMA sems (2, c)
    nrm_sems,    # DMA sems (2, c)
    *,
    n_qb: int,
    n_tiles: int,
    tile_n: int,
    t: int,
    qb_rows: int,
    c: int,
    f32_store: bool,
):
    b = pl.program_id(0)
    j = pl.program_id(1)
    ngroups = mins.shape[0]
    gpt = tile_n // GROUP
    prec = jax.lax.Precision.HIGHEST if f32_store else None

    # ---------------- sweep side (query block b) ---------------------------
    @pl.when(b < n_qb)
    def _sweep():
        @pl.when(j == 0)
        def _save_q():
            qsave[b % 2] = q_ref[:]

        cross = jax.lax.dot_general(
            q_ref[:], x_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec,
        )  # (QB, tile_n)
        sc = xn_ref[:][None, :] - 2.0 * cross
        gm = []
        for g in range(gpt):
            gm.append(jnp.min(sc[:, g * GROUP:(g + 1) * GROUP], axis=1))
        mins[pl.ds(j * gpt, gpt), :] = jnp.stack(gm, axis=0)

        # select at the end of the block's sweep, then kick off the first
        # two candidate chunks so rescore step (b+1, 0) has data waiting
        @pl.when(j == n_tiles - 1)
        def _select():
            ncb = mins.shape[1] // 128
            for cb in range(ncb):  # 128-query column blocks
                sel_scratch[:] = mins[:, cb * 128:(cb + 1) * 128]
                row_iota = jax.lax.broadcasted_iota(
                    jnp.int32, sel_scratch.shape, 0)
                big = jnp.int32(2 ** 30)
                for p in range(t):
                    s = sel_scratch[:]
                    v = jnp.min(s, axis=0)  # (128,)
                    hit = s == v[None, :]
                    a = jnp.min(jnp.where(hit, row_iota, big), axis=0)
                    ids_buf[b % 2, p, pl.ds(cb * 128, 128)] = a
                    if p == t - 1:
                        thr_buf[b % 2, 0, pl.ds(cb * 128, 128)] = v
                    sel_scratch[:] = jnp.where(
                        row_iota == a[None, :], _POS_INF, s)
            # scalar-readable copy for the candidate-DMA index reads
            cp = pltpu.make_async_copy(
                ids_buf.at[b % 2], ids_smem.at[b % 2], ids_sem)
            cp.start()
            cp.wait()

    # ---------------- rescore side (query block b-1) ------------------------
    # Tail entries (the last chunk when c doesn't divide qb*t) are CLAMPED
    # to the final entry rather than predicated out: the duplicates redo
    # one copy + one (1, GROUP) score write with identical values, which
    # is far cheaper than per-entry pl.when (whose state discharge is
    # pathologically slow to trace) and keeps DMA starts/waits balanced.
    total = qb_rows * t
    n_chunks = (total + c - 1) // c

    def entry_coords(e):
        qi = e // t
        return qi, e - qi * t

    def chunk_dmas(chunk, slot):
        # c candidate copies of chunk `chunk` for block b-1, slot-buffered
        for i in range(c):
            e = chunk * c + i
            if isinstance(e, int):
                if e >= total:
                    e = total - 1
            else:
                e = jnp.minimum(e, total - 1)
            qi, ti = entry_coords(e)
            gid = ids_smem[(b - 1) % 2, ti, qi]
            pltpu.make_async_copy(
                x_hbm.at[pl.ds(gid * GROUP, GROUP), :],
                cand_buf.at[slot, i],
                vec_sems.at[slot, i],
            ).start()
            pltpu.make_async_copy(
                n_hbm.at[pl.ds(gid, 1), :],
                cnorm_buf.at[slot, i],
                nrm_sems.at[slot, i],
            ).start()

    @pl.when((b >= 1) & (j == 0))
    def _kickoff():
        # write block b-1's ids + certificate threshold to its outputs
        # (the out blocks map to row b-1 during block b's steps)
        idsT = jnp.transpose(ids_buf[(b - 1) % 2], (1, 0))  # (QB, tp)
        tp = idsT.shape[1]
        ids_ref[:, pl.ds(0, tp)] = idsT
        scores_ref[:, pl.ds(t * GROUP, GROUP)] = jnp.broadcast_to(
            thr_buf[(b - 1) % 2, 0, :][:, None], (qb_rows, GROUP))
        chunk_dmas(0, 0)
        if n_chunks > 1:
            chunk_dmas(1, 1)

    @pl.when((b >= 1) & (j < n_chunks))
    def _rescore():
        slot = j % 2
        for i in range(c):
            e = jnp.minimum(j * c + i, total - 1)
            qi, ti = entry_coords(e)
            # Mosaic requires dynamic sublane indices to be provable
            # 8-multiples: load the 8-aligned row GROUP containing qi,
            # matmul all 8 rows against the candidate block (same MXU
            # cost as 1 row — M pads to the systolic tile anyway), and
            # mask-select row qi on the store side.
            qi8 = (qi // 8) * 8
            pltpu.make_async_copy(
                x_hbm.at[pl.ds(0, GROUP), :], cand_buf.at[slot, i],
                vec_sems.at[slot, i],
            ).wait()
            pltpu.make_async_copy(
                n_hbm.at[pl.ds(0, 1), :], cnorm_buf.at[slot, i],
                nrm_sems.at[slot, i],
            ).wait()
            q8 = qsave[(b - 1) % 2, pl.ds(qi8, 8), :]  # (8, dp)
            cross8 = jax.lax.dot_general(
                q8, cand_buf[slot, i],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=prec,
            )  # (8, GROUP)
            score8 = cnorm_buf[slot, i][0][None, :] - 2.0 * cross8
            rows = jax.lax.broadcasted_iota(jnp.int32, (8, GROUP), 0)
            mask = rows == (qi - qi8)
            blk = scores_ref[pl.ds(qi8, 8), pl.ds(ti * GROUP, GROUP)]
            scores_ref[pl.ds(qi8, 8), pl.ds(ti * GROUP, GROUP)] = (
                jnp.where(mask, score8, blk))
        # refill this slot with chunk j+2 (its previous occupant, chunk j,
        # was just consumed); chunks past the end are never waited, so
        # they must not start
        @pl.when(j + 2 < n_chunks)
        def _refill():
            chunk_dmas(j + 2, slot)


@functools.partial(
    jax.jit,
    static_argnames=("k", "metric", "tile_n", "t_margin", "qb_rows",
                     "interpret", "with_certificate"),
)
def topk_merged(
    q: jnp.ndarray,
    x: jnp.ndarray,
    k: int,
    metric: str = "l2",
    *,
    x_norms: Optional[jnp.ndarray] = None,
    tile_n: int = 4096,
    t_margin: int = 2,
    qb_rows: int = 512,
    interpret: Optional[bool] = None,
    with_certificate: bool = False,
) -> Tuple[jnp.ndarray, ...]:
    """Exact k-NN via the merged single-kernel two-phase (see module
    docstring). Same contract as ``topk_twophase`` (distances ascending
    for l2, descending for ip/cosine; optional per-query exactness
    certificate). Experimental scope: f32/bf16 stores, no int8.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if k > 128:
        raise ValueError("k > 128 not supported by the fused kernels")
    if metric == "cosine":
        from image_search_engine_tpu.ops.distances import l2_normalize

        q = l2_normalize(q)
        x = l2_normalize(x)
        metric = "ip"
    if metric not in ("l2", "ip"):
        raise ValueError(f"unsupported metric {metric!r}")
    if x.dtype == jnp.int8:
        raise ValueError("topk_merged: int8 stores not supported "
                         "(use topk_twophase)")

    qn, d = q.shape
    n = x.shape[0]
    dp = round_up(d, 128)
    tile_n = min(tile_n, round_up(n, 8 * GROUP))
    npad = round_up(n, tile_n)
    ngroups = npad // GROUP
    qb = min(qb_rows, round_up(qn, 128))
    qp = round_up(qn, qb)
    n_qb = qp // qb
    n_tiles = npad // tile_n

    xf = jnp.pad(x, ((0, npad - n), (0, dp - d)))
    qf = jnp.pad(q.astype(x.dtype), ((0, qp - qn), (0, dp - d)))
    if metric == "l2":
        if x_norms is None:
            norms = jnp.sum(x.astype(jnp.float32) * x, axis=1)
        else:
            norms = x_norms
    else:
        if x_norms is None:
            norms = jnp.zeros((n,), jnp.float32)
        else:
            norms = jnp.where(x_norms >= PAD_NORM / 2,
                              jnp.float32(PAD_NORM), 0.0)
        qf = qf * 0.5
    norms = jnp.pad(norms, (0, npad - n), constant_values=PAD_NORM)
    norms_2d = norms.reshape(ngroups, GROUP)

    t = min(k + t_margin, ngroups)
    tp = round_up(t, 8)
    c = max(1, -(-(qb * t) // n_tiles))  # candidate copies per inner step

    if c > 128:
        # too few sweep tiles to spread the candidate work over: the
        # per-step unroll would explode kernel code size (tiny corpora
        # relative to the query block — topk_twophase's regime anyway)
        raise ValueError(
            f"topk_merged: {c} candidate copies per step (qb={qb}, t={t}, "
            f"{n_tiles} tiles) — corpus too small for the merged schedule; "
            "use topk_twophase")

    f32_store = xf.dtype == jnp.float32
    kernel = functools.partial(
        _merged_kernel, n_qb=n_qb, n_tiles=n_tiles, tile_n=tile_n, t=t,
        qb_rows=qb, c=c, f32_store=f32_store,
    )
    grid = (n_qb + 1, n_tiles)
    bclamp = lambda b, j: jnp.minimum(b, n_qb - 1)  # noqa: E731
    vmem_bytes = min(
        int(ngroups * qb * 4            # mins
            + 8.0 * ngroups * 128 * 4   # select working set (measured r4)
            + 2 * (qb * tile_n // GROUP) * 4
            + 3 * tile_n * dp * xf.dtype.itemsize
            + 2 * qb * dp * 4 * 2
            + 2 * c * (GROUP * dp * xf.dtype.itemsize + GROUP * 4)
            + 3 * qb * (t + 1) * GROUP * 4)
        + (8 << 20),
        112 * (1 << 20),
    )
    scores, ids_out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((qb, dp), lambda b, j: (jnp.minimum(b, n_qb - 1), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n,), lambda b, j: (j,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, dp), lambda b, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # full store (manual DMA)
            pl.BlockSpec(memory_space=pl.ANY),  # norms (manual DMA)
        ],
        out_specs=(
            pl.BlockSpec((qb, (t + 1) * GROUP),
                         lambda b, j: (jnp.maximum(b - 1, 0), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((qb, 128), lambda b, j: (jnp.maximum(b - 1, 0), 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((qp, (t + 1) * GROUP), jnp.float32),
            jax.ShapeDtypeStruct((qp, 128), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((ngroups, qb), jnp.float32),          # mins
            pltpu.VMEM((ngroups, 128), jnp.float32),         # sel_scratch
            pltpu.VMEM((2, tp, qb), jnp.int32),              # ids_buf
            pltpu.SMEM((2, tp, qb), jnp.int32),              # ids_smem
            pltpu.SemaphoreType.DMA(()),                     # ids_sem
            pltpu.VMEM((2, 8, qb), jnp.float32),             # thr_buf
            pltpu.VMEM((2, qb, dp), xf.dtype),               # qsave
            pltpu.VMEM((2, c, GROUP, dp), xf.dtype),         # cand_buf
            pltpu.VMEM((2, c, 1, GROUP), jnp.float32),       # cnorm_buf
            pltpu.SemaphoreType.DMA((2, c)),                 # vec_sems
            pltpu.SemaphoreType.DMA((2, c)),                 # nrm_sems
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_bytes),
        interpret=interpret,
    )(qf, norms, xf, xf, norms_2d)

    scores = scores[:qn]
    cand_groups = ids_out[:qn, :t]
    rescored = scores[:, : t * GROUP]
    offs = jnp.arange(GROUP, dtype=jnp.int32)
    flat_ids = (cand_groups[..., None] * GROUP + offs).reshape(qn, t * GROUP)
    kk = min(k, t * GROUP)
    vals, pos = jax.lax.top_k(-rescored, kk)
    ids = jnp.take_along_axis(flat_ids, pos, axis=1)
    extra = ()
    if with_certificate:
        if t < ngroups:
            cert_threshold = scores[:, t * GROUP]  # lane 0 of the thr block
        else:
            cert_threshold = jnp.full((qn,), _POS_INF)
        # reduce, not a [kk-1] slice — TopkRewriter rule (topk_pallas.py)
        extra = ((-jnp.min(vals, axis=1)) <= cert_threshold,)
    if metric == "l2":
        qnorm = jnp.sum(q.astype(jnp.float32) * q, axis=1, keepdims=True)
        return (jnp.maximum(-vals + qnorm, 0.0), ids) + extra
    return (vals, ids) + extra
