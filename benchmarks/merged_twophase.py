"""Merged single-kernel two-phase vs the production two-dispatch pipeline
(VERDICT r4 next #3 — the named last lever of the speed-of-light
accounting): does interleaving query-block i's candidate DMAs with block
i+1's sweep inside ONE kernel close part of the 7.69 -> 3.95 ms gap?

Measures at the 1M x 128 bf16 headline point:
  * production ``topk_twophase`` (fused rescore + pallas select) at
    Q=2048 and Q=4096 (the pinned bench.py operating point);
  * ``topk_merged`` at the same Q with qb_rows in {256, 512, 1024};
  * id-set parity per Q, and a margin revalidation sweep (2048-query
    batches x reps vs the wide margin) if the merged kernel wins.

Protocol: bench.py's (compile the exact program timed, N dependent-free
dispatches, one readback, RTT subtracted; compile cache on).

    python benchmarks/merged_twophase.py [--reps 30]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

N, D, K = 1_000_000, 128, 10


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=30)
    ap.add_argument("--margin", type=int, default=2)
    ap.add_argument("--revalidate", type=int, default=0,
                    help="extra 2048-query batches to sweep against the "
                         "wide margin (0 = skip)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from image_search_engine_tpu.ops.topk_merged import topk_merged
    from image_search_engine_tpu.ops.topk_pallas import topk_twophase
    from image_search_engine_tpu.utils import compile_cache

    compile_cache.enable()
    assert jax.default_backend() == "tpu"
    rng = np.random.default_rng(0)

    # corpus generated on device (no tunnel upload)
    key = jax.random.PRNGKey(0)
    xb = jax.random.normal(key, (N, D), jnp.bfloat16)
    xn = jnp.sum(xb.astype(jnp.float32) ** 2, axis=1)
    q_all = np.asarray(
        jax.random.normal(jax.random.PRNGKey(1), (4096, D), jnp.float32))

    tiny = jax.jit(lambda v: v + 1.0)
    _ = np.asarray(tiny(jnp.zeros((8, 128))))
    t0 = time.time()
    for _ in range(5):
        _ = np.asarray(tiny(jnp.zeros((8, 128))))
    rtt = (time.time() - t0) / 5
    print(f"rtt {rtt*1e3:.1f} ms", flush=True)

    def timed(fn, reps):
        out = fn()
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
        t0 = time.time()
        for _ in range(reps):
            out = fn()
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
        return max((time.time() - t0 - rtt) / reps, 1e-9)

    for qn in (2048, 4096):
        qj = jnp.asarray(q_all[:qn])
        qb_prod = 32 if qn == 2048 else 64  # bench.py pins
        el_prod = timed(lambda: topk_twophase(
            qj, xb, K, "l2", x_norms=xn, tile_n=4096, t_margin=args.margin,
            qb=qb_prod, with_certificate=True), args.reps)
        print(f"Q={qn} production two-phase: {el_prod*1e3:.2f} ms -> "
              f"{qn/el_prod/1e3:.1f}k QPS", flush=True)
        dp_, ip_, cp_ = topk_twophase(
            qj, xb, K, "l2", x_norms=xn, tile_n=4096, t_margin=args.margin,
            qb=qb_prod, with_certificate=True)
        ip_ = np.asarray(ip_)
        assert np.asarray(cp_).all(), "production certificate failed"

        for qbr in (256, 512, 1024):
            try:
                el = timed(lambda: topk_merged(
                    qj, xb, K, "l2", x_norms=xn, tile_n=4096,
                    t_margin=args.margin, qb_rows=qbr,
                    with_certificate=True), args.reps)
            except Exception as e:  # noqa: BLE001 — record, keep sweeping
                print(f"Q={qn} merged qb_rows={qbr}: FAILED {type(e).__name__}: "
                      f"{str(e)[:300]}", flush=True)
                continue
            dm, im, cm = topk_merged(
                qj, xb, K, "l2", x_norms=xn, tile_n=4096,
                t_margin=args.margin, qb_rows=qbr, with_certificate=True)
            im, cm = np.asarray(im), np.asarray(cm)
            mism = sum(set(a) != set(b)
                       for a, b in zip(im.tolist(), ip_.tolist()))
            print(f"Q={qn} merged qb_rows={qbr}: {el*1e3:.2f} ms -> "
                  f"{qn/el/1e3:.1f}k QPS | cert {int(cm.sum())}/{qn} | "
                  f"id-set mism vs production {mism}/{qn} | "
                  f"speedup x{el_prod/el:.3f}", flush=True)

    if args.revalidate:
        print("margin revalidation vs wide (merged kernel):", flush=True)
        bad = 0
        for r in range(args.revalidate):
            qs = np.asarray(jax.random.normal(
                jax.random.PRNGKey(100 + r), (2048, D), jnp.float32))
            qj = jnp.asarray(qs)
            _, i_m, c_m = topk_merged(qj, xb, K, "l2", x_norms=xn,
                                      tile_n=4096, t_margin=args.margin,
                                      qb_rows=256, with_certificate=True)
            _, i_w = topk_merged(qj, xb, K, "l2", x_norms=xn, tile_n=4096,
                                 t_margin=32, qb_rows=256)[:2]
            i_m, i_w = np.asarray(i_m), np.asarray(i_w)
            bad += sum(set(a) != set(b)
                       for a, b in zip(i_m.tolist(), i_w.tolist()))
            assert np.asarray(c_m).all() or bad, "cert tripped"
        print(f"  mismatches vs wide margin: {bad}/{args.revalidate*2048}",
              flush=True)


if __name__ == "__main__":
    main()
