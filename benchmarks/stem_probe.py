"""Is the ResNet stem (7x7 s2 conv on 3 input channels) a meaningful
slice of embed time, and does a space-to-depth reformulation pay on TPU?

The 7x7/s2/3->64 stem is the canonical TPU conv inefficiency: 3 input
channels occupy 3 of 128 MXU lanes. The MLPerf-era fix reshapes the
input 2x2 space-to-depth — (H, W, 3) -> (H/2, W/2, 12) — and convolves
with the equivalently reshaped kernel (7x7 zero-padded to 8x8, split
into 2x2 phases): mathematically identical output, 4x the channel
occupancy. This probe times, at the embed operating point (batch 256,
224x224, bf16):

  1. full ResNet50 forward (reference point, ~31 ms/batch in BENCH_NOTES)
  2. the stem alone as-is (conv 7x7 s2 + BN/relu + maxpool)
  3. the stem with the space-to-depth conv (parity-checked vs 2)

    python benchmarks/stem_probe.py [--steps 20]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

B, H, W = 256, 224, 224


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    assert jax.default_backend() == "tpu"
    tiny = jax.jit(lambda v: v + 1.0)
    _ = np.asarray(tiny(jnp.zeros((8, 128))))
    t0 = time.time()
    for _ in range(3):
        _ = np.asarray(tiny(jnp.zeros((8, 128))))
    rtt = (time.time() - t0) / 3
    print(f"tunnel RTT {rtt*1e3:.0f} ms", flush=True)

    rng = np.random.default_rng(0)
    x = jax.device_put(jnp.asarray(
        rng.random((B, H, W, 3), np.float32), jnp.bfloat16))
    k = jnp.asarray(rng.standard_normal((7, 7, 3, 64), np.float32) * 0.05,
                    jnp.bfloat16)

    def drain(out):
        # force completion with a DEVICE-side reduce + 1-element readback:
        # np.asarray(big_out) would pull the whole activation through the
        # ~27 MB/s tunnel and hand the protocol seconds of phantom time
        return float(jnp.sum(out.astype(jnp.float32)))

    def timeit(name, fn, *a):
        out = fn(*a)
        drain(out)
        t0 = time.time()
        for _ in range(args.steps):
            out = fn(*a)
        drain(out)
        el = (time.time() - t0 - rtt) / args.steps
        print(f"{name}: {el*1e3:.2f} ms ({B/el:.0f} img/s)", flush=True)
        return out

    # 1. full resnet50 forward
    from image_search_engine_tpu.models.resnet import ResNet50
    model = ResNet50(dtype=jnp.bfloat16)
    vars_ = model.init(jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3)), train=False)

    @jax.jit
    def full_fwd(v, xx):
        return model.apply(v, xx, train=False)

    timeit("resnet50 full fwd", full_fwd, vars_, x)

    # 2. stem as-is: conv 7x7 s2 pad 3 + maxpool 3x3 s2 pad 1
    @jax.jit
    def stem(xx, kk):
        y = jax.lax.conv_general_dilated(
            xx, kk, (2, 2), [(3, 3), (3, 3)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        y = jax.nn.relu(y)
        return jax.lax.reduce_window(
            y, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
            [(0, 0), (1, 1), (1, 1), (0, 0)])

    ref = timeit("stem 7x7s2 + pool", stem, x, k)

    # 3. space-to-depth stem: pad kernel 7x7 -> 8x8 (one leading zero row/
    # col so the s2 sampling grid with pad 3 becomes pad 4 = whole 2x2
    # phases), reshape input (H/2, W/2, 12) and kernel (4, 4, 12, 64),
    # stride-1... -> conv s1? No: 8x8 s2 on H = 4x4 s1 on H/2 ONLY if the
    # window advances one transformed pixel per output — s2 on original =
    # s1 on transformed. Output size differs from SAME; use exact padding.
    kp = jnp.pad(k, ((1, 0), (1, 0), (0, 0), (0, 0)))  # (8, 8, 3, 64)
    # transformed kernel: phase (py, px) of the 8x8 taps -> channel block
    k2 = kp.reshape(4, 2, 4, 2, 3, 64).transpose(0, 2, 1, 3, 4, 5)
    k2 = k2.reshape(4, 4, 2 * 2 * 3, 64)

    @jax.jit
    def stem_s2d(xx, kk2):
        b, h, w, c = xx.shape
        # space-to-depth 2x2: channel order must match the kernel reshape
        # ((py, px, c) fastest-varying c)
        xt = xx.reshape(b, h // 2, 2, w // 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
        xt = xt.reshape(b, h // 2, w // 2, 4 * c)
        # original: out[i] = sum_{t in 8x8} x[2i - 4 + t] (pad 4 after the
        # kernel pad). transformed rows u = (2i-4+t)//2 -> 4x4 window at
        # stride 1 starting u0 = i - 2 -> padding (2, ?) each side on the
        # H/2 grid; output length 112 needs total pad = 112 - 1 + 4 - 112
        # = 3 -> (2, 1).
        y = jax.lax.conv_general_dilated(
            xt, kk2, (1, 1), [(2, 1), (2, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        y = jax.nn.relu(y)
        return jax.lax.reduce_window(
            y, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
            [(0, 0), (1, 1), (1, 1), (0, 0)])

    out = timeit("stem space2depth  ", stem_s2d, x, k2)
    a, b2 = np.asarray(ref, np.float32), np.asarray(out, np.float32)
    print(f"  parity: max|diff| = {np.abs(a - b2).max():.2e} "
          f"(shapes {a.shape} vs {b2.shape})", flush=True)


if __name__ == "__main__":
    main()
