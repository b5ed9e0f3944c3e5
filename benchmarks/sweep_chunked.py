"""Phase-1 sweep MXU/VPU overlap experiment.

The group-min kernel is ~65% MXU-utilization at Q=2048 (4.13 ms vs the
2.7 ms FLOPs bound): within one grid step the (Q, tile_n) matmul and the
VPU min pass are data-dependent and serial. Chunking the tile's columns
inside the kernel (dot 512 cols -> min 512 cols -> next chunk) exposes
MXU/VPU overlap to Mosaic's scheduler — if it pipelines, sweep time drops
toward max(MXU, VPU) ~ 2.9 ms.

Measures sweep-only time (mins summed, no select/rescore) for the current
kernel vs chunked variants.

    python benchmarks/sweep_chunked.py
"""

from __future__ import annotations

import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

N, D, Q, ITERS, TILE_N = 1_000_000, 128, 2048, 30, 4096


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from image_search_engine_tpu.ops import topk_pallas as tp
    from image_search_engine_tpu.parallel.topk import PAD_NORM

    assert jax.default_backend() == "tpu"
    GROUP = tp.GROUP

    rng = np.random.default_rng(0)
    xh = rng.standard_normal((N, D)).astype(np.float32)
    x = jnp.asarray(xh, jnp.bfloat16)
    xb32 = np.asarray(x, np.float32)
    xn = jnp.asarray(np.sum(xb32 * xb32, axis=1))
    qh = rng.standard_normal((ITERS, Q, D)).astype(np.float32)
    qs = [jnp.asarray(qh[i]) for i in range(ITERS)]

    npad = tp.round_up(N, TILE_N)
    ngroups = npad // GROUP

    def chunked_kernel(q_ref, xn_ref, x_ref, out_ref, *, tile_n, chunk):
        for c0 in range(0, tile_n, chunk):
            cross = jax.lax.dot_general(
                q_ref[:], x_ref[c0:c0 + chunk, :],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (Qp, chunk)
            scores = xn_ref[c0:c0 + chunk][None, :] - 2.0 * cross
            for g in range(chunk // GROUP):
                out_ref[(c0 // GROUP) + g, :] = jnp.min(
                    scores[:, g * GROUP:(g + 1) * GROUP], axis=1)

    def build(kernel_fn, **kw):
        @jax.jit
        def sweep(q, xf, norms):
            qn_rows, d = q.shape
            dp = tp.round_up(d, 128)
            qp = tp.round_up(qn_rows, 16)
            qf = jnp.pad(q.astype(jnp.bfloat16), ((0, qp - qn_rows), (0, dp - d)))
            vmem = min(int(1.5 * (qp * TILE_N * 4 + 2 * TILE_N * dp * 2
                                  + qp * dp * 4)) + (1 << 20), 112 << 20)
            mins = pl.pallas_call(
                functools.partial(kernel_fn, tile_n=TILE_N, **kw),
                grid=(npad // TILE_N,),
                in_specs=[
                    pl.BlockSpec((qp, dp), lambda i: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((TILE_N,), lambda i: (i,), memory_space=pltpu.VMEM),
                    pl.BlockSpec((TILE_N, dp), lambda i: (i, 0), memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((TILE_N // GROUP, qp), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((ngroups, qp), jnp.float32),
                compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem),
            )(qf, norms, xf)
            return jnp.sum(mins)
        return sweep

    xf = jnp.pad(x, ((0, npad - N), (0, 0)))
    norms = jnp.pad(xn, (0, npad - N), constant_values=PAD_NORM)

    tiny = jax.jit(lambda v: v + 1.0)
    _ = np.asarray(tiny(jnp.zeros((8, 128))))
    t0 = time.time()
    for _ in range(3):
        _ = np.asarray(tiny(jnp.zeros((8, 128))))
    rtt = (time.time() - t0) / 3

    def current_kernel(q_ref, xn_ref, x_ref, out_ref, *, tile_n):
        tp._groupmin_kernel(q_ref, xn_ref, x_ref, out_ref, tile_n=tile_n)

    variants = [("current", build(current_kernel))]
    for chunk in (512, 1024):
        variants.append((f"chunk={chunk}",
                         build(chunked_kernel, chunk=chunk)))

    ref = None
    for name, fn in variants:
        s = fn(qs[0], xf, norms)
        v = float(np.asarray(s))
        if ref is None:
            ref = v
        else:
            assert abs(v - ref) < abs(ref) * 1e-6 + 1.0, (name, v, ref)
        t0 = time.time()
        for it in range(ITERS):
            s = fn(qs[it], xf, norms)
        _ = np.asarray(s)
        el = max(time.time() - t0 - rtt, 1e-9)
        print(f"sweep {name}: {el/ITERS*1e3:.2f} ms/dispatch "
              f"({ITERS*Q/el/1e3:.1f}k QPS-equivalent)", flush=True)


if __name__ == "__main__":
    main()
