"""Fused distance + top-k Pallas kernels — the serving-path hot op.

Two exact algorithms behind one contract:

  * ``topk_pallas`` — running-accumulator kernel (below): best when Q is
    small, since tiles that beat nobody are rejected with one min-pass.
    At large Q nearly every tile improves some query, and the k-pass merge
    degenerates to k*Q*N VPU work.
  * ``topk_twophase`` — the scalable exact algorithm: phase 1 fuses the
    distance matmul with a per-128-column-group min (one pass, so the
    whole sweep is HBM-bandwidth-bound); phase 2 takes each query's 2k
    best groups — any group containing a top-k element must have a group
    min <= the global k-th distance, and at most k groups can, so k
    groups provably cover the exact answer (2k absorbs ties) — gathers
    those candidates, and rescans them exactly in XLA. Extra traffic is
    O(Q * 2k * 128 * d) — negligible next to the O(N * d) stream.

Both replace Faiss's flat-index scan (``faiss.IndexFlatL2/IP.search``,
built at backend/utils.py:293-330 and called at backend/engine.py:55).
The accumulator kernel streams the store through VMEM tile by tile and
maintains a running top-k accumulator, so the (Q, N) distance matrix never
materializes in HBM:

  * the distance tile is one (Q, d) x (d, TILE_N) matmul on the MXU using
    the ``||x||^2 - 2 q.x`` expansion (store norms precomputed once);
  * the top-k accumulator lives in VMEM scratch and persists across the
    sequential TPU grid;
  * a tile is merged only when its per-row minimum beats some query's
    current k-th best — after warm-up almost every tile is rejected with a
    single VPU min-pass, so the steady-state cost is the matmul + one
    reduction, i.e. HBM-bandwidth bound (the speed-of-light for exact
    search);
  * merging extracts the tile's top-k with k unrolled min/argmin passes and
    folds it into the sorted accumulator with k more passes over (Q, 2k).

Exact (not approximate): parity-tested against ops/distances.topk_flat.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from image_search_engine_tpu.ops import round_up

_NEG_INF = float("-inf")
_POS_INF = float("inf")



def _extract_topk_inplace(scores_ref, col_ids, k: int):
    """k unrolled min/argmin extraction passes over a (Q, M) scores *ref*.

    Mutating the ref in place keeps the VMEM footprint at one buffer
    (k SSA copies of a (Q, TILE_N) tile blow the Mosaic scoped-vmem stack).
    Returns (vals (Q, k) ascending, ids (Q, k)); consumes the scores by
    masking extracted columns to +inf.
    """
    q_rows, m = scores_ref.shape
    col_iota = jax.lax.broadcasted_iota(jnp.int32, (q_rows, m), 1)
    vals, ids = [], []
    for _ in range(k):
        s = scores_ref[:]
        v = jnp.min(s, axis=1)  # (Q,)
        a = jnp.argmin(s, axis=1).astype(jnp.int32)  # (Q,)
        # Gather col_ids at the argmin via masked sum (Mosaic has no
        # general gather); the mask also retires the extracted column.
        sel = col_iota == a[:, None]
        vals.append(v)
        ids.append(jnp.sum(jnp.where(sel, col_ids, 0), axis=1))
        scores_ref[:] = jnp.where(sel, _POS_INF, s)
    return jnp.stack(vals, axis=1), jnp.stack(ids, axis=1)


def _topk_kernel(
    q_ref,  # (Qp, dp) VMEM
    xn_ref,  # (TILE_N,) VMEM store norms (or zeros for IP)
    x_ref,  # (TILE_N, dp) VMEM store tile
    out_d_ref,  # (Qp, k) VMEM
    out_i_ref,  # (Qp, k) VMEM
    acc_d,  # (Qp, k) VMEM scratch, sorted ascending
    acc_i,  # (Qp, k) VMEM scratch
    scores_buf,  # (Qp, TILE_N) VMEM scratch for in-place extraction
    merge_buf,  # (Qp, 2k) VMEM scratch for the accumulator fold
    merge_ids,  # (Qp, 2k) VMEM scratch
    *,
    k: int,
    tile_n: int,
    n_valid: int,
):
    i = pl.program_id(0)
    n_tiles = pl.num_programs(0)

    @pl.when(i == 0)
    def _init():
        acc_d[:] = jnp.full_like(acc_d, _POS_INF)
        acc_i[:] = jnp.full_like(acc_i, -1)

    qp = q_ref.shape[0]

    # Distance tile on the MXU: ||x||^2 - 2 q.x  (the ||q||^2 term is a
    # per-row constant; the host-side wrapper re-adds it for true L2).
    cross = jax.lax.dot_general(
        q_ref[:],
        x_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # (Qp, TILE_N)
    scores = xn_ref[:][None, :] - 2.0 * cross

    # Mask padding columns (global col >= n_valid) so they can never win.
    col_iota = jax.lax.broadcasted_iota(jnp.int32, (qp, tile_n), 1)
    global_cols = col_iota + i * tile_n
    scores = jnp.where(global_cols < n_valid, scores, _POS_INF)

    # Reject-fast path: merge only if some query row improves.
    row_min = jnp.min(scores, axis=1)  # (Qp,)
    worst = acc_d[:, k - 1]  # (Qp,) current k-th best
    any_improve = jnp.any(row_min < worst)

    @pl.when(any_improve)
    def _merge():
        scores_buf[:] = scores
        tile_d, tile_ids = _extract_topk_inplace(scores_buf, global_cols, k)
        # Fold sorted tile top-k into the sorted accumulator: top-k of 2k.
        merge_buf[:] = jnp.concatenate([acc_d[:], tile_d], axis=1)  # (Qp, 2k)
        cat_i = jnp.concatenate([acc_i[:], tile_ids], axis=1)
        merge_ids[:] = cat_i
        new_d, new_i = _extract_topk_inplace(merge_buf, merge_ids[:], k)
        acc_d[:] = new_d
        acc_i[:] = new_i

    @pl.when(i == n_tiles - 1)
    def _finalize():
        out_d_ref[:] = acc_d[:]
        out_i_ref[:] = acc_i[:]


@functools.partial(
    jax.jit, static_argnames=("k", "metric", "tile_n", "interpret")
)
def topk_pallas(
    q: jnp.ndarray,
    x: jnp.ndarray,
    k: int,
    metric: str = "l2",
    *,
    x_norms: Optional[jnp.ndarray] = None,
    tile_n: int = 1024,
    interpret: Optional[bool] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact k-NN via the fused Pallas kernel. Same contract as
    ``ops.distances.topk_flat``: returns (distances, indices), distances
    ascending for l2, descending for ip/cosine.

    Args:
      q: (Q, d) f32/bf16 queries.
      x: (N, d) store.
      k: neighbors (<= 128).
      metric: "l2" | "ip" | "cosine".
      x_norms: optional precomputed ||x||^2 (N,) to skip recomputation.
      tile_n: store rows per VMEM tile.
      interpret: force Pallas interpret mode (defaults to True off-TPU).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if k > 128:
        raise ValueError("k > 128 not supported by the fused kernel")

    if metric == "cosine":
        from image_search_engine_tpu.ops.distances import l2_normalize

        q = l2_normalize(q)
        x = l2_normalize(x)
        metric = "ip"
    if metric not in ("l2", "ip"):
        raise ValueError(f"unsupported metric {metric!r}")

    qn, d = q.shape
    n = x.shape[0]
    dp = round_up(d, 128)
    qp = round_up(qn, 8)
    tile_n = min(tile_n, round_up(n, 128))
    npad = round_up(n, tile_n)

    qf = jnp.pad(q.astype(jnp.float32), ((0, qp - qn), (0, dp - d)))
    xf = jnp.pad(x.astype(jnp.float32), ((0, npad - n), (0, dp - d)))
    if metric == "l2":
        norms = jnp.sum(x.astype(jnp.float32) * x, axis=1) if x_norms is None else x_norms
        norms = jnp.pad(norms, (0, npad - n))
    else:
        # IP: score = -q.x, realized by xn=0 and halving the -2 factor via
        # pre-scaling q by 0.5. If the caller passed (possibly poisoned)
        # store norms, keep only the pad poisoning: real norms must not
        # shift IP scores.
        from image_search_engine_tpu.parallel.topk import PAD_NORM

        qf = qf * 0.5
        if x_norms is None:
            norms = jnp.zeros((npad,), jnp.float32)
        else:
            penalty = jnp.where(x_norms >= PAD_NORM / 2, jnp.float32(PAD_NORM), 0.0)
            norms = jnp.pad(penalty, (0, npad - n))
    grid = (npad // tile_n,)
    kernel = functools.partial(_topk_kernel, k=k, tile_n=tile_n, n_valid=n)
    out_d, out_i = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((qp, dp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, dp), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((qp, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((qp, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((qp, k), jnp.float32),
            jax.ShapeDtypeStruct((qp, k), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((qp, k), jnp.float32),
            pltpu.VMEM((qp, k), jnp.int32),
            pltpu.VMEM((qp, tile_n), jnp.float32),
            pltpu.VMEM((qp, 2 * k), jnp.float32),
            pltpu.VMEM((qp, 2 * k), jnp.int32),
        ],
        interpret=interpret,
    )(qf, norms, xf)

    out_d = out_d[:qn]
    out_i = out_i[:qn]
    if metric == "l2":
        qnorm = jnp.sum(q.astype(jnp.float32) * q, axis=1, keepdims=True)
        return jnp.maximum(out_d + qnorm, 0.0), out_i
    return -out_d, out_i


# ---------------------------------------------------------------------------
# Two-phase exact top-k (scalable in Q): grouped-min sweep + candidate rescan
# ---------------------------------------------------------------------------

GROUP = 128  # candidate-group width (one lane row)


def _groupmin_kernel(q_ref, xn_ref, x_ref, out_ref, *, tile_n: int):
    """Phase 1: distance tile on the MXU + min over each 128-column group.

    out block: (tile_n // GROUP, Qp) group minima for this tile —
    transposed so the lane dimension is the (>=128-wide) query axis, per
    Mosaic block-shape rules. One pass over the tile, HBM-bandwidth-bound.
    """
    # HIGHEST forces true-f32 matmul (3-pass); bf16 inputs use the native
    # MXU path (Mosaic rejects HIGHEST for bf16 operands)
    prec = jax.lax.Precision.HIGHEST if q_ref.dtype == jnp.float32 else None
    cross = jax.lax.dot_general(
        q_ref[:],
        x_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=prec,
    )  # (Qp, tile_n)
    scores = xn_ref[:][None, :] - 2.0 * cross
    mins = []
    for g in range(tile_n // GROUP):
        mins.append(jnp.min(scores[:, g * GROUP : (g + 1) * GROUP], axis=1))
    out_ref[:] = jnp.stack(mins, axis=0)  # (tile_n//GROUP, Qp)


def _groupmin_kernel_q8(q_ref, qs_ref, xn_ref, scale_ref, x_ref, out_ref, *, tile_n: int):
    """Phase-1 variant for an int8-quantized store: int8 queries x int8
    tile on the MXU's native int8 path (no in-kernel dtype cast of the big
    tile — a bf16 cast forces a Mosaic retiling that costs more than the
    DMA savings); the per-row dequant scales fold into the f32 epilogue on
    the small (Q, tile) result."""
    cross = jax.lax.dot_general(
        q_ref[:],
        x_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # (Qp, tile_n) int32
    scores = (
        xn_ref[:][None, :]
        - cross.astype(jnp.float32) * (2.0 * qs_ref[:][:, None] * scale_ref[:][None, :])
    )
    mins = []
    for g in range(tile_n // GROUP):
        mins.append(jnp.min(scores[:, g * GROUP : (g + 1) * GROUP], axis=1))
    out_ref[:] = jnp.stack(mins, axis=0)


def _fused_rescore_kernel(cand_ref, *refs, qb: int, f32_store: bool):
    """Phase 2 fused: gather + rescore one candidate group per query row.

    2-D grid (query row-block, candidate slot). The block index maps read
    each query row's slot-th candidate group id from the scalar-prefetch
    ref, so every step DMAs ``qb`` (GROUP, dp) store blocks (plus their
    (GROUP,) norm blocks — 512 B next to the 32 KB vectors) straight into
    VMEM — no (Q, t*GROUP, d) gather buffer in HBM (whose write + re-read
    was the binding term at large Q: 141k -> 250k QPS at 1M x 128 x
    Q=2048, benchmarks/fused_production.py).

    Scoring mirrors the XLA phase 2 exactly: score-to-minimize =
    norms - 2 q.x, where for l2 ``norms`` are the caller's squared norms
    and for ip they are the pad-poison penalty only (and q carries a 0.5
    factor), so PAD_NORM-poisoned rows — the wrapper's own pads AND any
    pre-padded rows inside the caller's store (index/store.py) — can
    never enter the final top-k.
    """
    q_ref = refs[0]
    x_refs = refs[1 : 1 + qb]
    n_refs = refs[1 + qb : 1 + 2 * qb]
    out_ref = refs[1 + 2 * qb]
    prec = jax.lax.Precision.HIGHEST if f32_store else None
    for j in range(qb):
        xb = x_refs[j][:]  # (GROUP, dp) store dtype
        cross = jax.lax.dot_general(
            q_ref[j][None, :],
            xb,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec,
        )  # (1, GROUP)
        out_ref[j, :] = (n_refs[j][0] - 2.0 * cross)[0]  # norms block (1, 1, GROUP)


def _fused_rescore_kernel_q8(cand_ref, *refs, qb: int):
    """int8 variant of ``_fused_rescore_kernel``: int8 query rows x int8
    candidate blocks on the MXU's native int8 path; per-row dequant scales
    (gathered next to the norm blocks) fold into the (1, GROUP) epilogue.
    Candidate gather traffic is 4x smaller than f32 — and the phase-2
    gather is the two-phase search's binding term at large Q."""
    q_ref = refs[0]  # (qb, dp) int8
    qs_ref = refs[1]  # (qb, GROUP) f32 lane-broadcast query scales (x0.5 for ip)
    x_refs = refs[2 : 2 + qb]
    n_refs = refs[2 + qb : 2 + 2 * qb]
    s_refs = refs[2 + 2 * qb : 2 + 3 * qb]
    out_ref = refs[2 + 3 * qb]
    for j in range(qb):
        xb = x_refs[j][:]  # (GROUP, dp) int8
        cross = jax.lax.dot_general(
            q_ref[j][None, :],
            xb,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )  # (1, GROUP) int32
        # qs_ref row j is the query's scale repeated across the 128 lanes;
        # norm/scale blocks are (1, 1, GROUP)
        score = n_refs[j][0] - cross.astype(jnp.float32) * (
            (2.0 * qs_ref[j][None, :]) * s_refs[j][0]
        )
        out_ref[j, :] = score[0]


def _select_topt_kernel(mins_ref, vals_ref, ids_ref, scratch, *, t: int):
    """Candidate select as t unrolled extract-min passes over one
    (ngroups, qb) column block of the phase-1 group mins.

    Replaces the XLA ``lax.top_k(-mins, t)`` select, which at the 1M
    headline point measured 1.29 ms of the 8.2 ms dispatch (partial-sort
    machinery + the (ngroups, Q) -> (Q, ngroups) relayout its transposed
    input forces). t passes of min/where over a VMEM-resident block do
    the same job in VPU time. Ties break to the smallest group index
    (deterministic; lax.top_k ties are implementation-defined — the
    exactness machinery only needs ANY t groups attaining the t smallest
    mins, and the certificate threshold is the t-th VALUE, tie-agnostic).
    """
    scratch[:] = mins_ref[:]
    # out blocks are (round_up(t, 8), qb): init the padding rows too
    vals_ref[:] = jnp.full_like(vals_ref, _POS_INF)
    ids_ref[:] = jnp.zeros_like(ids_ref)
    row_iota = jax.lax.broadcasted_iota(jnp.int32, scratch.shape, 0)
    big = jnp.int32(2**30)
    for p in range(t):
        s = scratch[:]
        v = jnp.min(s, axis=0)  # (qb,)
        # argmin as where+min over the row iota (ties -> smallest index);
        # also retires the extracted row for the next pass
        hit = s == v[None, :]
        a = jnp.min(jnp.where(hit, row_iota, big), axis=0)
        vals_ref[p, :] = v
        ids_ref[p, :] = a
        scratch[:] = jnp.where(row_iota == a[None, :], _POS_INF, s)


def _select_topt(mins_gq, t: int, interpret: bool):
    """Per-query t smallest group mins via ``_select_topt_kernel``.

    mins_gq: (ngroups, qp) f32, UNtransposed phase-1 output (the XLA
    select consumed ``mins.T``, paying a 64 MB relayout at the headline
    point; this consumes the group-major layout directly). ngroups must
    be 8-divisible (guaranteed when npad is a multiple of 8*GROUP — the
    multi-tile case; callers guard the rest). Returns (vals (t, qp)
    ascending, ids (t, qp) int32).
    """
    g, qp = mins_gq.shape
    qb_sel = 128  # lane-dim column block
    qpp = round_up(qp, qb_sel)
    if qpp != qp:
        mins_gq = jnp.pad(mins_gq, ((0, 0), (0, qpp - qp)))
    tp = round_up(t, 8)  # second-minor block dim must be 8-divisible
    vals, ids = pl.pallas_call(
        functools.partial(_select_topt_kernel, t=t),
        grid=(qpp // qb_sel,),
        in_specs=[
            pl.BlockSpec((g, qb_sel), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tp, qb_sel), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tp, qb_sel), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((tp, qpp), jnp.float32),
            jax.ShapeDtypeStruct((tp, qpp), jnp.int32),
        ),
        scratch_shapes=[pltpu.VMEM((g, qb_sel), jnp.float32)],
        # the unrolled passes keep ~4-5 live (g, qb) temporaries on the
        # Mosaic scoped-vmem stack (measured 18.96 MB at ngroups=7840, vs
        # 10.57 MB with a 2.5x-block limit): size for 8 blocks
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(int(8.0 * g * qb_sel * 4) + (4 << 20),
                                 112 * (1 << 20))
        ),
        interpret=interpret,
    )(mins_gq)
    return vals[:t], ids[:t]


def quantize_store_int8(x) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric per-row int8 quantization: returns (codes (N, d) int8,
    scales (N,) f32) with x ~= codes * scales[:, None]."""
    x = jnp.asarray(x, jnp.float32)
    amax = jnp.max(jnp.abs(x), axis=1)
    scale = jnp.maximum(amax, 1e-12) / 127.0
    codes = jnp.clip(jnp.round(x / scale[:, None]), -127, 127).astype(jnp.int8)
    return codes, scale


@functools.partial(
    jax.jit,
    static_argnames=("k", "metric", "tile_n", "t_margin", "interpret",
                     "fused_rescore", "qb", "with_certificate",
                     "select_impl"),
)
def topk_twophase(
    q: jnp.ndarray,
    x: jnp.ndarray,
    k: int,
    metric: str = "l2",
    *,
    x_norms: Optional[jnp.ndarray] = None,
    x_scale: Optional[jnp.ndarray] = None,
    tile_n: int = 4096,
    t_margin: int = 4,
    interpret: Optional[bool] = None,
    fused_rescore: Optional[bool] = None,
    qb: int = 8,
    with_certificate: bool = False,
    select_impl: str = "pallas",
) -> Tuple[jnp.ndarray, ...]:
    """Exact k-NN via grouped-min sweep + candidate rescan. Same contract
    as ``topk_flat``/``topk_pallas``. Scales to large query batches: the
    phase-1 Pallas kernel is one matmul + one reduction pass per tile.

    Store dtype controls the sweep's HBM traffic: float32, bfloat16, or
    int8 (pass ``x_scale`` (N,) per-row dequant scales — both phases then
    score the quantized values with per-row-quantized queries on the MXU's
    native int8 path, so results are exact over the quantized store).

    ``t_margin`` sets the candidate width t = k + t_margin. k groups
    provably cover the exact answer under exact arithmetic; the margin
    absorbs phase-1/phase-2 float-accumulation-order swaps near the k-th
    boundary. Measured at 1M x 128 / k=10 / Q=2048 (40960-query agreement
    sweeps vs the wide margin, benchmarks/margin_validation.py): bf16
    margins 0/1/2 lose a neighbor on 1538/67/2 queries, margin 3 measured
    0 mismatches (int8: margin 2 already 0). Throughput scales ~(k+m)/(k+4)
    since the phase-2 candidate gather is the binding term. The default
    keeps the full cushion; tuned callers (bench.py) pass 3 (XLA phase 2)
    or 2 (fused phase 2, validated separately).

    ``with_certificate`` adds a per-query runtime exactness certificate
    as a third output (bool (Q,)): True when the k-th final rescored
    score is <= the t-th smallest phase-1 group min. Every UNSCANNED
    group's min is >= that t-th value (the scan takes the t smallest),
    so True means no pruned group could have held a strictly better
    neighbor — a provably valid exact top-k for THIS dispatch (ties
    broken arbitrarily, as Faiss does). Using the t-th value instead of
    the true (t+1)-th threshold is sound (it is a lower bound on it)
    and keeps the candidate-select data flow untouched — the threshold
    reuses the select's own values output, costing one compare. Under
    exact arithmetic the certificate holds for any margin >= 2 (at most
    k groups can tie min <= the k-th distance); a False means phase-1/
    phase-2 accumulation-order divergence crossed the margin for that
    query — re-run wider (``topk_twophase_safe`` automates this).
    Honesty note: the comparison mixes phase-1 (threshold) and phase-2
    (k-th score) arithmetic, so a certified result can still differ
    from true-f32 exact by at most one accumulation-order ulp on a
    boundary element — the same epsilon class as the bf16 store
    rounding, and far below the margin-swap errors it detects.

    ``fused_rescore`` (default on; all store dtypes) replaces the XLA
    gather+einsum phase 2 with a Pallas kernel whose
    block index maps select candidate groups via scalar prefetch — the
    (Q, t*GROUP, d) gather buffer never exists in HBM, which moves the
    1M x 128 x Q=2048 headline 141k -> ~250k QPS. Both phases read the
    same ``x_norms`` (norm blocks are gathered next to the vector blocks
    — 512 B vs 32 KB), so pad poisoning and phase-1/phase-2 norm
    consistency hold by construction. ``qb`` is the kernel's query rows
    per grid step.

    ``select_impl`` picks the candidate-select stage: "pallas" (default)
    runs t extract-min passes over the group-major mins in a Pallas
    kernel (``_select_topt``) — no (ngroups, Q) transpose relayout, no
    XLA partial sort; measured 8.14 -> 7.69 ms (+5.9% QPS) at the 1M
    headline with identical ids and 100% certificates. "xla" keeps the
    ``lax.top_k`` select (the parity oracle; also the automatic fallback
    when ngroups isn't 8-divisible or t covers every group, and the only
    path of the non-fused phase 2). Results are exact either way — ties
    in group mins may pick different covering groups, which the
    certificate machinery is agnostic to (threshold = the t-th VALUE).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    is_int8 = x.dtype == jnp.int8
    if is_int8 and x_scale is None:
        raise ValueError("int8 store requires x_scale")
    if metric == "cosine":
        if is_int8:
            raise ValueError("pre-normalize rows and use metric='ip' with int8")
        from image_search_engine_tpu.ops.distances import l2_normalize

        q = l2_normalize(q)
        x = l2_normalize(x)
        metric = "ip"
    if metric not in ("l2", "ip"):
        raise ValueError(f"unsupported metric {metric!r}")

    if fused_rescore is None:
        fused_rescore = True

    qn_rows, d = q.shape
    n = x.shape[0]
    dp = round_up(d, 128)
    # bf16 tiles want 16-row sublane alignment; int8 wants 32 (and the
    # query-scale vector wants a 128-wide lane dim)
    qp = round_up(qn_rows, 128 if is_int8 else (16 if x.dtype != jnp.float32 else 8))
    if fused_rescore:
        qp = round_up(qp, qb)  # fused grid steps over qb-row query blocks
    if round_up(n, GROUP) <= tile_n:
        # single tile: phase-1 blocks equal the whole (padded) array, which
        # Mosaic accepts at any GROUP multiple
        tile_n = round_up(n, GROUP)
    else:
        # multi-tile: the (tile_n//GROUP, Qp) out block's sublane dim must
        # be 8-divisible and the 1-D norm input's T(1024) tile must divide
        # tile_n -> tile_n must be a multiple of 8*GROUP (= 1024). Small
        # non-conforming tile_n values crash Mosaic lowering on hardware
        # (they pass in interpret mode, which skips layout checks).
        tile_n = round_up(tile_n, 8 * GROUP)
    npad = round_up(n, tile_n)
    ngroups = npad // GROUP

    # Keep the store's dtype: a bfloat16/int8 store cuts HBM footprint and
    # sweep traffic 2x/4x (though at the batched operating point the search
    # is MXU/dispatch-bound, so throughput is similar); accumulation is f32.
    if is_int8:
        # quantize queries per-row too: the int8 x int8 dot rides the MXU's
        # native int8 path with no in-kernel cast of the streamed tile
        q32 = q.astype(jnp.float32)
        sq = jnp.maximum(jnp.max(jnp.abs(q32), axis=1), 1e-12) / 127.0
        q_int = jnp.clip(jnp.round(q32 / sq[:, None]), -127, 127).astype(jnp.int8)
        qf = jnp.pad(q_int, ((0, qp - qn_rows), (0, dp - d)))
        qs_pad = jnp.pad(sq, (0, qp - qn_rows))
        if metric == "ip":
            qs_pad = qs_pad * 0.5  # epilogue multiplies by 2*qs*scale
        xf = jnp.pad(x, ((0, npad - n), (0, dp - d)))
        scale_pad = jnp.pad(jnp.asarray(x_scale, jnp.float32), (0, npad - n))
    else:
        store_dt = jnp.bfloat16 if x.dtype == jnp.bfloat16 else jnp.float32
        qf = jnp.pad(q.astype(store_dt), ((0, qp - qn_rows), (0, dp - d)))
        xf = jnp.pad(x.astype(store_dt), ((0, npad - n), (0, dp - d)))
        scale_pad = None

    from image_search_engine_tpu.parallel.topk import PAD_NORM

    if metric == "l2":
        if x_norms is None:
            if is_int8:
                deq = x.astype(jnp.float32) * jnp.asarray(x_scale, jnp.float32)[:, None]
                norms = jnp.sum(deq * deq, axis=1)
            else:
                norms = jnp.sum(x.astype(jnp.float32) * x, axis=1)
        else:
            norms = x_norms
    else:
        # IP: poisoned-pad penalty only; real norms must not shift scores
        if x_norms is None:
            norms = jnp.zeros((n,), jnp.float32)
        else:
            norms = jnp.where(x_norms >= PAD_NORM / 2, jnp.float32(PAD_NORM), 0.0)
        if not is_int8:
            qf = qf * 0.5  # int8 folds the 0.5 into the query scales
    # wrapper's own padding rows: poison so they never enter candidates
    norms = jnp.pad(norms, (0, npad - n), constant_values=PAD_NORM)

    grid = (npad // tile_n,)
    out_spec = pl.BlockSpec(
        (tile_n // GROUP, qp), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    out_shape = jax.ShapeDtypeStruct((ngroups, qp), jnp.float32)
    # The epilogue's (Qp, tile_n) f32 scores buffer dominates the kernel's
    # scoped-VMEM footprint; the 16 MB default limit rejects large query
    # batches, so size the limit to the actual buffers (v5e has 128 MB).
    vmem_bytes = min(
        int(1.5 * (qp * tile_n * 4 + 2 * tile_n * dp * xf.dtype.itemsize
                   + qp * dp * 4)) + (1 << 20),
        112 * (1 << 20),
    )
    cparams = pltpu.CompilerParams(vmem_limit_bytes=vmem_bytes)
    if is_int8:
        mins = pl.pallas_call(
            functools.partial(_groupmin_kernel_q8, tile_n=tile_n),
            grid=grid,
            in_specs=[
                pl.BlockSpec((qp, dp), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((qp,), lambda i: (0,), memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_n,), lambda i: (i,), memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_n,), lambda i: (i,), memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_n, dp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=out_spec,
            out_shape=out_shape,
            compiler_params=cparams,
            interpret=interpret,
        )(qf, qs_pad, norms, scale_pad, xf)
    else:
        mins = pl.pallas_call(
            functools.partial(_groupmin_kernel, tile_n=tile_n),
            grid=grid,
            in_specs=[
                pl.BlockSpec((qp, dp), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_n,), lambda i: (i,), memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_n, dp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=out_spec,
            out_shape=out_shape,
            compiler_params=cparams,
            interpret=interpret,
        )(qf, norms, xf)
    mins_gq = mins  # (ngroups, Qp) group-major, as phase 1 emits it
    mins = mins.T  # (Qp, ngroups)

    # Phase 2 (XLA): the k best groups per query provably cover the exact
    # top-k (each group holding a top-k element has min <= the k-th global
    # distance, and at most k groups can); +4 absorbs distance ties.
    # Candidates are gathered as whole (GROUP, dp) blocks — one contiguous
    # 32 KB DMA per group instead of 128 random 256 B row reads (the row
    # gather capped throughput at ~26k QPS; block reads ride the streaming
    # bandwidth).
    t = min(k + t_margin, ngroups)
    # certificate threshold: the t-th smallest group min lower-bounds every
    # unscanned group's min. t == ngroups means everything was scanned.
    if fused_rescore:
        # phase 2 grids over only round_up(Q, qb) query rows — qp's larger
        # padding (up to 128 rows for int8) is a phase-1 lane constraint,
        # and each padded row here costs t discarded group-block DMAs.
        # The pad rows that remain participate (scores discarded); their
        # candidate ids are in-range, so the gathers stay valid.
        qp2 = min(qp, round_up(qn_rows, qb))
        # the select kernel keeps the (ngroups, 128) mins block plus ~4-5
        # live same-size temporaries in scoped VMEM (its CompilerParams
        # budget 8 blocks); ngroups scales with the corpus (npad/GROUP),
        # so past ~5-10M rows that budget exceeds the 112 MB cap and the
        # compile would FAIL at dispatch time — fall back to the XLA
        # select there instead (it has no such ceiling)
        select_fits = (8.0 * ngroups * 128 * 4) + (4 << 20) <= 112 * (1 << 20)
        if (select_impl == "pallas" and t < ngroups and ngroups % 8 == 0
                and select_fits):
            # t-pass extract-min Pallas select over the group-major mins:
            # skips the (ngroups, Q) transpose relayout AND the XLA
            # partial sort (1.29 ms -> VPU time at the 1M headline
            # point), and emits the certificate threshold (the t-th
            # smallest VALUE) directly — no full-width gather needed.
            sel_vals, sel_ids = _select_topt(mins_gq, t, interpret)
            cand_groups = sel_ids.T[:qp2]  # (Qp2, t), ascending mins
            if with_certificate:
                cert_threshold = sel_vals[t - 1, :qn_rows]
        else:
            _, cand_groups = jax.lax.top_k(-mins[:qp2], t)  # (Qp2, t)
            if with_certificate:
                # threshold = the t-th smallest group min = max over the
                # selected groups' mins. Computed as a FULL-WIDTH gather +
                # reduce on purpose: consuming top_k's values output, or
                # any narrower slice of its indices, breaks XLA TPU's
                # TopkRewriter (slice-of-slice folds into a second sort
                # user with different bounds) and degrades the select to a
                # full stable (Q, ngroups) variadic sort — measured +54%
                # dispatch time at the 1M point.
                cert_threshold = (
                    jnp.max(jnp.take_along_axis(mins[:qp2], cand_groups,
                                                axis=1), axis=1)[:qn_rows]
                    if t < ngroups else jnp.full((qn_rows,), _POS_INF)
                )
        cand_flat = cand_groups.reshape(-1).astype(jnp.int32)

        def xn_map(j):
            # step (i, jt): the jt-th candidate group of query row i*qb+j
            return lambda i, jt, cand: (cand[(i * qb + j) * t + jt], 0)

        def nn_map(j):
            # same group id, on the LEADING dim of a (ngroups, 1, GROUP)
            # view — like the vector blocks. (1-D f32 arrays carry an XLA
            # T(1024) tile layout Mosaic can't block at 128 granularity; a
            # (ngroups, GROUP) view needs 8-divisible sublane blocks; and a
            # lane-dim map over a (1, npad) view compiled pathologically
            # slowly, >20 min vs ~4 min for this form.)
            return lambda i, jt, cand: (cand[(i * qb + j) * t + jt], 0, 0)

        norms_2d = norms.reshape(ngroups, 1, GROUP)
        out_spec2 = pl.BlockSpec((qb, GROUP), lambda i, jt, cand: (i, jt))
        out_shape2 = jax.ShapeDtypeStruct((qp2, t * GROUP), jnp.float32)
        cparams2 = pltpu.CompilerParams(
            vmem_limit_bytes=min(
                int(3.0 * qb * (GROUP * dp * xf.dtype.itemsize + GROUP * 4))
                + (4 << 20),
                112 * (1 << 20),
            )
        )
        if is_int8:
            scales_2d = scale_pad.reshape(ngroups, 1, GROUP)
            # lane-broadcast query scales: row j of the (qb, 128) block is
            # query (i*qb+j)'s dequant scale in every lane
            qs_2d = jnp.broadcast_to(qs_pad[:qp2, None], (qp2, GROUP))
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(qp2 // qb, t),
                in_specs=[
                    pl.BlockSpec((qb, dp), lambda i, jt, cand: (i, 0)),
                    pl.BlockSpec((qb, GROUP), lambda i, jt, cand: (i, 0)),
                    *[pl.BlockSpec((GROUP, dp), xn_map(j)) for j in range(qb)],
                    *[pl.BlockSpec((1, 1, GROUP), nn_map(j)) for j in range(qb)],
                    *[pl.BlockSpec((1, 1, GROUP), nn_map(j)) for j in range(qb)],
                ],
                out_specs=out_spec2,
            )
            scores = pl.pallas_call(
                functools.partial(_fused_rescore_kernel_q8, qb=qb),
                grid_spec=grid_spec,
                out_shape=out_shape2,
                compiler_params=cparams2,
                interpret=interpret,
            )(cand_flat, qf, qs_2d, *([xf] * qb), *([norms_2d] * qb),
              *([scales_2d] * qb))
        else:
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(qp2 // qb, t),
                in_specs=[
                    pl.BlockSpec((qb, dp), lambda i, jt, cand: (i, 0)),
                    *[pl.BlockSpec((GROUP, dp), xn_map(j)) for j in range(qb)],
                    *[pl.BlockSpec((1, 1, GROUP), nn_map(j)) for j in range(qb)],
                ],
                out_specs=out_spec2,
            )
            scores = pl.pallas_call(
                functools.partial(
                    _fused_rescore_kernel,
                    qb=qb,
                    f32_store=(xf.dtype == jnp.float32),
                ),
                grid_spec=grid_spec,
                out_shape=out_shape2,
                compiler_params=cparams2,
                interpret=interpret,
            )(cand_flat, qf, *([xf] * qb), *([norms_2d] * qb))
        scores = scores[:qn_rows]
        cand_groups = cand_groups[:qn_rows]
        offs = jnp.arange(GROUP, dtype=jnp.int32)
        flat_ids = (cand_groups[..., None] * GROUP + offs).reshape(
            qn_rows, t * GROUP
        )
        kk = min(k, t * GROUP)
        vals, pos = jax.lax.top_k(-scores, kk)
        ids = jnp.take_along_axis(flat_ids, pos, axis=1)
        extra = ()
        if with_certificate:
            # k-th final minimize-domain score vs best unscanned group min
            # reduce (not a [kk-1] column slice): a second slice user would
            # break the final top_k's TopkRewriter too
            extra = ((-jnp.min(vals, axis=1)) <= cert_threshold,)
        if metric == "l2":
            qnorm = jnp.sum(q.astype(jnp.float32) * q, axis=1, keepdims=True)
            return (jnp.maximum(-vals + qnorm, 0.0), ids) + extra
        # ip: scores are penalty - q.x, so the negated top-k values are q.x
        return (vals, ids) + extra

    _, cand_groups = jax.lax.top_k(-mins[:qn_rows], t)  # (Q, t)
    if with_certificate:
        # full-width gather + max — see the fused branch's TopkRewriter note
        cert_threshold = (
            jnp.max(jnp.take_along_axis(mins[:qn_rows], cand_groups, axis=1),
                    axis=1)
            if t < ngroups else jnp.full((qn_rows,), _POS_INF)
        )
    offsets = jnp.arange(GROUP, dtype=jnp.int32)
    flat_ids = (cand_groups[..., None] * GROUP + offsets).reshape(qn_rows, t * GROUP)
    vecs = xf.reshape(ngroups, GROUP, dp)[cand_groups]  # (Q, t, GROUP, dp)
    vecs = vecs.reshape(qn_rows, t * GROUP, dp)
    cn = norms.reshape(ngroups, GROUP)[cand_groups].reshape(qn_rows, t * GROUP)  # poisoned at pads
    if is_int8:
        # rescore on the int8 codes directly: int8 x int8 -> int32 on the
        # MXU, dequant folded into the tiny (Q, t*GROUP) epilogue. The old
        # dequantize-then-f32-einsum materialized (Q, t*GROUP, d) in f32 —
        # 4x the gather traffic — and measured 13% slower at Q=2048.
        # Scales gathered as whole groups too (same contiguity argument).
        cand_scales = scale_pad.reshape(ngroups, GROUP)[cand_groups].reshape(
            qn_rows, t * GROUP
        )
        cross_i = jnp.einsum("qd,qcd->qc", qf[:qn_rows], vecs,
                             preferred_element_type=jnp.int32)
        # qs_pad carries the per-query dequant scale (x0.5 for ip, matching
        # phase 1), so this equals q . x_deq (l2) / 0.5 q . x_deq (ip)
        cross = cross_i.astype(jnp.float32) * (qs_pad[:qn_rows, None] * cand_scales)
    else:
        # qf is already the store dtype (phase-1 consistency); bf16 x bf16
        # products are exact in the f32 accumulator
        prec = jax.lax.Precision.HIGHEST if xf.dtype == jnp.float32 else None
        cross = jnp.einsum("qd,qcd->qc", qf[:qn_rows], vecs,
                           preferred_element_type=jnp.float32, precision=prec)
    kk = min(k, t * GROUP)
    if metric == "l2":
        dist = cn - 2.0 * cross
        vals, pos = jax.lax.top_k(-dist, kk)
        ids = jnp.take_along_axis(flat_ids, pos, axis=1)
        extra = ()
        if with_certificate:
            # reduce (not a [kk-1] column slice): a second slice user would
            # break the final top_k's TopkRewriter too
            extra = ((-jnp.min(vals, axis=1)) <= cert_threshold,)
        qnorm = jnp.sum(q.astype(jnp.float32) * q, axis=1, keepdims=True)
        return (jnp.maximum(-vals + qnorm, 0.0), ids) + extra
    # ip: cross is 0.5 q.x (q or its scale pre-halved), so 2x restores it.
    # Phase-1 mins live in the minimize domain (penalty - q.x = -score),
    # so the certificate compares the NEGATED k-th score.
    score = 2.0 * cross - cn
    vals, pos = jax.lax.top_k(score, kk)
    ids = jnp.take_along_axis(flat_ids, pos, axis=1)
    extra = ()
    if with_certificate:
        # reduce (not a [kk-1] column slice): a second slice user would
            # break the final top_k's TopkRewriter too
            extra = ((-jnp.min(vals, axis=1)) <= cert_threshold,)
    return (vals, ids) + extra


def topk_twophase_safe(
    q,
    x,
    k: int,
    metric: str = "l2",
    *,
    x_norms: Optional[jnp.ndarray] = None,
    x_scale: Optional[jnp.ndarray] = None,
    t_margin: int = 4,
    wide_margin: int = 32,
    **kw,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """``topk_twophase`` with the runtime exactness certificate enforced.

    Runs the fast path at ``t_margin`` with ``with_certificate=True``; if
    any query's certificate fails (phase-1/phase-2 accumulation-order
    divergence exceeded the margin — empirically 0/40960 queries at the
    shipped margin, benchmarks/margin_validation.py), the WHOLE dispatch
    re-runs at ``wide_margin`` (a separate compiled program, built lazily
    on first violation). This turns the empirically-validated margin into
    a per-dispatch machine-checked guarantee at ~zero steady-state cost:
    the certificate itself is one extra top-k column + a compare.

    Host-side by necessity — the escalation is data-dependent control
    flow. Jit-embedded callers (engine's fused embed+search) thread the
    certificate out of their program and escalate themselves.
    """
    # One combined device_get for (d, i, cert): the certificate check and
    # the results cost a single host transfer (~30 ms RTT over the dev
    # tunnel), not two. Returns host numpy arrays.
    d, i, cert = jax.device_get(topk_twophase(
        q, x, k, metric, x_norms=x_norms, x_scale=x_scale,
        t_margin=t_margin, with_certificate=True, **kw,
    ))
    if cert.all():
        return d, i
    import logging

    logging.getLogger(__name__).warning(
        "top-k exactness certificate failed for %d/%d queries at margin %d; "
        "re-running at margin %d",
        int((~cert).sum()), cert.shape[0], t_margin, wide_margin,
    )
    d, i, cert = jax.device_get(topk_twophase(
        q, x, k, metric, x_norms=x_norms, x_scale=x_scale,
        t_margin=wide_margin, with_certificate=True, **kw,
    ))
    if not cert.all():
        # a wide-margin failure means divergence beyond anything measured;
        # surface it rather than loop (results are still the wide rescan's
        # best-effort exact top-k)
        logging.getLogger(__name__).error(
            "certificate still failing at margin %d (%d queries)",
            wide_margin, int((~cert).sum()),
        )
    return d, i
