"""Which bilinear-remap formulation is fastest on TPU? Times the gather
variants behind ``augmentations._remap_batch`` plus the photometric rest
of ``augment_batch``, at the reference training geometry (352x256).

Found so far (BENCH_NOTES "Device-side augmentation"): the original
three vmapped 2-D-index remap passes cost 349 ms at batch 32 (the whole
train step's budget); composing the geometric maps into ONE remap with a
batch-flat axis-0 take cut it to 54 ms — but batch 128 still scales
superlinearly (933 ms), suggesting the gather falls off a cliff once the
flattened operand outgrows VMEM. Variants here probe that:

  flat-global   one take over the (B*H*W, C) batch-flat array (current)
  vmap-flat     per-image (H*W, C) takes, vmapped (operand stays small)
  chunked-16    flat-global over lax.map chunks of 16 images

    python benchmarks/remap_variants.py [--steps 10]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

IMAGE_SIZE = (352, 256)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--batches", type=int, nargs="*", default=[32, 128])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import image_search_engine_tpu.training.siamese.augmentations as aug

    assert jax.default_backend() == "tpu"
    tiny = jax.jit(lambda v: v + 1.0)
    _ = np.asarray(tiny(jnp.zeros((8, 128))))
    t0 = time.time()
    for _ in range(3):
        _ = np.asarray(tiny(jnp.zeros((8, 128))))
    rtt = (time.time() - t0) / 3
    print(f"tunnel RTT {rtt*1e3:.0f} ms", flush=True)

    h, w = IMAGE_SIZE
    rng = np.random.default_rng(0)

    def timeit(name, fn, *a):
        out = fn(*a)
        _ = np.asarray(out[(0,) * out.ndim])
        t0 = time.time()
        for _ in range(args.steps):
            out = fn(*a)
        _ = np.asarray(out[(0,) * out.ndim])
        el = (time.time() - t0 - rtt) / args.steps
        print(f"  {name}: {el*1e3:.1f} ms", flush=True)
        return out

    def flat_global(imgs, sy, sx):
        # the pre-patch formulation: one take per corner tap over the
        # batch-flat (B*H*W, C) array (kept local — production
        # _remap_batch is now the patch+chunk winner)
        b_, h_, w_, c = imgs.shape
        y0 = jnp.floor(sy).astype(jnp.int32)
        x0 = jnp.floor(sx).astype(jnp.int32)
        wy = (sy - y0)[..., None]
        wx = (sx - x0)[..., None]
        flat = imgs.reshape(b_ * h_ * w_, c)
        base = (jnp.arange(b_, dtype=jnp.int32) * (h_ * w_))[:, None, None]

        def tap(yi, xi):
            yc = jnp.clip(yi, 0, h_ - 1)
            xc = jnp.clip(xi, 0, w_ - 1)
            return jnp.take(flat, (base + yc * w_ + xc).reshape(-1),
                            axis=0).reshape(b_, h_, w_, c)

        out = (tap(y0, x0) * ((1 - wy) * (1 - wx))
               + tap(y0, x0 + 1) * ((1 - wy) * wx)
               + tap(y0 + 1, x0) * (wy * (1 - wx))
               + tap(y0 + 1, x0 + 1) * (wy * wx))
        inside = ((sy >= 0) & (sy <= h_ - 1)
                  & (sx >= 0) & (sx <= w_ - 1))[..., None]
        return jnp.where(inside, out, 1.0)

    def vmap_flat(imgs, sy, sx):
        def one(img, y, x):
            return flat_global(img[None], y[None], x[None])[0]
        return jax.vmap(one)(imgs, sy, sx)

    def chunked(imgs, sy, sx, fn, nc):
        b = imgs.shape[0]
        if b <= nc:
            return fn(imgs, sy, sx)
        return jax.lax.map(
            lambda t: fn(*t),
            (imgs.reshape(b // nc, nc, h, w, 3),
             sy.reshape(b // nc, nc, h, w),
             sx.reshape(b // nc, nc, h, w)),
        ).reshape(b, h, w, 3)

    def patch_gather(imgs, sy, sx, dtype=jnp.float32):
        """ONE gather for all four bilinear taps: each row of the flat
        operand is the 2x2 edge-replicated patch at that pixel (12
        values), so the gather touches 4x fewer rows — and a gathered row
        costs a full memory tile regardless of payload."""
        b_, h_, w_, c = imgs.shape
        p = imgs.astype(dtype)
        right = jnp.concatenate([p[:, :, 1:], p[:, :, -1:]], axis=2)
        down = jnp.concatenate([p[:, 1:], p[:, -1:]], axis=1)
        dright = jnp.concatenate([down[:, :, 1:], down[:, :, -1:]], axis=2)
        patches = jnp.concatenate([p, right, down, dright], axis=-1)
        flat = patches.reshape(b_ * h_ * w_, 4 * c)
        y0 = jnp.floor(sy).astype(jnp.int32)
        x0 = jnp.floor(sx).astype(jnp.int32)
        wy = (sy - y0)[..., None].astype(dtype)
        wx = (sx - x0)[..., None].astype(dtype)
        yc = jnp.clip(y0, 0, h_ - 1)
        xc = jnp.clip(x0, 0, w_ - 1)
        base = (jnp.arange(b_, dtype=jnp.int32) * (h_ * w_))[:, None, None]
        idx = (base + yc * w_ + xc).reshape(-1)
        tap = jnp.take(flat, idx, axis=0).reshape(b_, h_, w_, 4, c)
        out = (
            tap[..., 0, :] * ((1 - wy) * (1 - wx))
            + tap[..., 1, :] * ((1 - wy) * wx)
            + tap[..., 2, :] * (wy * (1 - wx))
            + tap[..., 3, :] * (wy * wx)
        )
        inside = ((sy >= 0) & (sy <= h_ - 1)
                  & (sx >= 0) & (sx <= w_ - 1))[..., None]
        return jnp.where(inside, out, jnp.asarray(1.0, dtype)).astype(
            jnp.float32)

    for b in args.batches:
        print(f"batch={b}:", flush=True)
        imgs = jax.device_put(jnp.asarray(rng.random((b, h, w, 3), np.float32)))
        # a mild rotation grid (exercises real 2-D displacement)
        ys = jnp.arange(h, dtype=jnp.float32)
        xs = jnp.arange(w, dtype=jnp.float32)
        gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
        th = 0.1
        cy, cx = (h - 1) / 2, (w - 1) / 2
        sy = jnp.cos(th) * (gy - cy) - jnp.sin(th) * (gx - cx) + cy
        sx = jnp.sin(th) * (gy - cy) + jnp.cos(th) * (gx - cx) + cx
        sy = jnp.broadcast_to(sy, (b, h, w))
        sx = jnp.broadcast_to(sx, (b, h, w))
        sy, sx = jax.device_put((sy, sx))

        import functools as ft

        ref = timeit("remap flat-global   ", jax.jit(flat_global), imgs, sy, sx)
        variants = [
            ("remap vmap-flat     ", jax.jit(vmap_flat)),
            ("remap flat chunk16  ",
             jax.jit(ft.partial(chunked, fn=flat_global, nc=16))),
            ("remap flat chunk8   ",
             jax.jit(ft.partial(chunked, fn=flat_global, nc=8))),
            ("remap patch         ", jax.jit(patch_gather)),
            ("remap patch chunk16 ",
             jax.jit(ft.partial(chunked, fn=patch_gather, nc=16))),
            ("remap patch chunk8  ",
             jax.jit(ft.partial(chunked, fn=patch_gather, nc=8))),
            ("remap patch bf16 c16",
             jax.jit(ft.partial(
                 chunked,
                 fn=ft.partial(patch_gather, dtype=jnp.bfloat16), nc=16))),
            ("production          ", jax.jit(aug._remap_batch)),
        ]
        for name, fn in variants:
            out = timeit(name, fn, imgs, sy, sx)
            tol = 1e-2 if "bf16" in name else 1e-5
            ok = np.allclose(np.asarray(out), np.asarray(ref), atol=tol)
            print(f"    parity: {'OK' if ok else 'MISMATCH'}", flush=True)

        # full pipeline reference point (photometric cost ~= full minus
        # the winning remap time minus the cheap grid composition)
        timeit("augment_batch full", aug.augment_batch,
               jax.random.PRNGKey(0), imgs)


if __name__ == "__main__":
    main()
