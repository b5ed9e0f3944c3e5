"""Batched image augmentations on device.

The reference pipes every training image through albumentations on the
host (backend/siamese/augmentations.py:5-40) via a ``tf.numpy_function``
graph-break that SURVEY.md flags as a bottleneck (siamese_tf/dataset.py:
57-59). Here the same augmentation family is pure jitted JAX: one fused
program augments the whole batch on the TPU, keyed by a PRNG key, so the
input pipeline never leaves the device.

Op-for-op parity with the reference Compose, INCLUDING its per-op
application probabilities (each op fires per image with the probability
in ``OP_PROBS``, sampled from the PRNG key — albumentations' ``p=``):

  HueSaturationValue(p=.5), RandomBrightnessContrast(p=.5),
  RandomGamma(60..120, p=.5), ISONoise(p=.5), PixelDropout(p=.5),
  Blur(limit 5, p=.5), CoarseDropout(p=.1),
  ShiftScaleRotate(zoom-out only, p=.5), Perspective(p=.3),
  ShiftScaleRotate(shift only .05, p=.5), SafeRotate(10deg, p=.1),
  OpticalDistortion(p=.5) — every geometric op pads WHITE (card images).

The three affine ops (zoom-out, shift, rotate) compose into ONE matrix
per image before sampling, so the batch pays a single bilinear resample
for all of them; perspective and optical distortion are separate gated
remap passes (they are not affine).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from image_search_engine_tpu.ops.image_ops import rgb_to_hsv

# albumentations p= of each op in the reference Compose (order preserved)
OP_PROBS = {
    "hsv": 0.5,
    "brightness_contrast": 0.5,
    "gamma": 0.5,
    "iso_noise": 0.5,
    "pixel_dropout": 0.5,
    "blur": 0.5,
    "coarse_dropout": 0.1,
    "zoom_out": 0.5,
    "perspective": 0.3,
    "shift": 0.5,
    "safe_rotate": 0.1,
    "optical_distortion": 0.5,
}


def _hsv_to_rgb(hsv: jnp.ndarray) -> jnp.ndarray:
    """Inverse of ops.image_ops.rgb_to_hsv (H in degrees)."""
    h, s, v = hsv[..., 0] / 60.0, hsv[..., 1], hsv[..., 2]
    c = v * s
    x = c * (1.0 - jnp.abs(jnp.mod(h, 2.0) - 1.0))
    m = v - c
    z = jnp.zeros_like(c)
    i = jnp.clip(jnp.floor(h).astype(jnp.int32), 0, 5)
    sel = [i == k for k in range(6)]
    r = jnp.select(sel, [c, x, z, z, x, c])
    g = jnp.select(sel, [x, c, c, x, z, z])
    b = jnp.select(sel, [z, z, x, c, c, x])
    return jnp.stack([r + m, g + m, b + m], axis=-1)


def _remap(img: jnp.ndarray, src_y: jnp.ndarray, src_x: jnp.ndarray,
           fill: float = 1.0) -> jnp.ndarray:
    """Bilinear-sample one (H, W, C) image at the given source coords.
    Out-of-bounds fills WHITE (the reference's card-image padding)."""
    h, w, _ = img.shape
    y0 = jnp.floor(src_y).astype(jnp.int32)
    x0 = jnp.floor(src_x).astype(jnp.int32)
    wy = src_y - y0
    wx = src_x - x0

    def gather(yi, xi):
        yc = jnp.clip(yi, 0, h - 1)
        xc = jnp.clip(xi, 0, w - 1)
        return img[yc, xc]

    v00 = gather(y0, x0)
    v01 = gather(y0, x0 + 1)
    v10 = gather(y0 + 1, x0)
    v11 = gather(y0 + 1, x0 + 1)
    out = (
        v00 * ((1 - wy) * (1 - wx))[..., None]
        + v01 * ((1 - wy) * wx)[..., None]
        + v10 * (wy * (1 - wx))[..., None]
        + v11 * (wy * wx)[..., None]
    )
    inside = (
        (src_y >= 0) & (src_y <= h - 1) & (src_x >= 0) & (src_x <= w - 1)
    )[..., None]
    return jnp.where(inside, out, fill)


def _affine_sample(img: jnp.ndarray, mat: jnp.ndarray, fill: float = 1.0) -> jnp.ndarray:
    """Bilinear-sample one (H, W, C) image through a (2, 3) matrix mapping
    output (y, x, 1) -> input coords."""
    h, w, _ = img.shape
    ys = jnp.arange(h, dtype=jnp.float32)
    xs = jnp.arange(w, dtype=jnp.float32)
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    src_y = mat[0, 0] * gy + mat[0, 1] * gx + mat[0, 2]
    src_x = mat[1, 0] * gy + mat[1, 1] * gx + mat[1, 2]
    return _remap(img, src_y, src_x, fill)


def _box_blur(x: jnp.ndarray, ksize: int) -> jnp.ndarray:
    """Separable box blur over (B, H, W, C) with SAME edges (the
    reference's A.Blur is a normalized box filter)."""
    pad = ksize // 2
    kern = jnp.ones((ksize,), jnp.float32) / ksize
    xp = jnp.moveaxis(x, -1, 1)  # (B, C, H, W)
    xp = jax.lax.conv_general_dilated(
        xp.reshape(-1, 1, *xp.shape[2:]), kern.reshape(1, 1, ksize, 1),
        (1, 1), [(pad, pad), (0, 0)],
    )
    xp = jax.lax.conv_general_dilated(
        xp, kern.reshape(1, 1, 1, ksize), (1, 1), [(0, 0), (pad, pad)],
    )
    xp = xp.reshape(x.shape[0], x.shape[3], x.shape[1], x.shape[2])
    return jnp.moveaxis(xp, 1, -1)


def sample_gates(key: jax.Array, b: int) -> dict:
    """Per-image application masks for every op, as albumentations' ``p=``
    does — a pure function of the key so tests (and ``augment_batch``)
    derive identical gating."""
    names = sorted(OP_PROBS)
    keys = jax.random.split(jax.random.fold_in(key, 0xA06), len(names))
    return {n: jax.random.bernoulli(k, OP_PROBS[n], (b,))
            for n, k in zip(names, keys)}


def _g(gates: dict, name: str) -> jnp.ndarray:
    return gates[name][:, None, None, None]


@functools.partial(jax.jit, static_argnames=())
def augment_batch(key: jax.Array, images: jnp.ndarray) -> jnp.ndarray:
    """Full augmentation stack over (B, H, W, 3) RGB [0,1] images."""
    b, h, w, _ = images.shape
    gates = sample_gates(key, b)
    keys = jax.random.split(key, 16)
    x = images

    # brightness / contrast (RandomBrightnessContrast, p=.5)
    bright = jax.random.uniform(keys[0], (b, 1, 1, 1), minval=-0.2, maxval=0.2)
    contrast = jax.random.uniform(keys[1], (b, 1, 1, 1), minval=0.8, maxval=1.2)
    bc = jnp.clip((x - 0.5) * contrast + 0.5 + bright, 0.0, 1.0)
    x = jnp.where(_g(gates, "brightness_contrast"), bc, x)

    # gamma (RandomGamma gamma_limit=(60, 120) -> exponent 0.6..1.2, p=.5)
    gamma = jax.random.uniform(keys[2], (b, 1, 1, 1), minval=0.6, maxval=1.2)
    x = jnp.where(_g(gates, "gamma"), jnp.clip(x, 1e-6, 1.0) ** gamma, x)

    # HSV jitter (HueSaturationValue, p=.5)
    hsv = rgb_to_hsv(x)
    dh = jax.random.uniform(keys[3], (b, 1, 1), minval=-15.0, maxval=15.0)
    ds = jax.random.uniform(keys[4], (b, 1, 1), minval=0.85, maxval=1.15)
    hsv = hsv.at[..., 0].set(jnp.mod(hsv[..., 0] + dh, 360.0))
    hsv = hsv.at[..., 1].set(jnp.clip(hsv[..., 1] * ds, 0.0, 1.0))
    x = jnp.where(_g(gates, "hsv"), jnp.clip(_hsv_to_rgb(hsv), 0.0, 1.0), x)

    # ISO-style gaussian noise (p=.5)
    noise_sigma = jax.random.uniform(keys[5], (b, 1, 1, 1), minval=0.0, maxval=0.03)
    noised = jnp.clip(x + noise_sigma * jax.random.normal(keys[6], x.shape), 0.0, 1.0)
    x = jnp.where(_g(gates, "iso_noise"), noised, x)

    # pixel dropout (PixelDropout: ~1% of pixels to 0, p=.5)
    drop = jax.random.bernoulli(keys[7], 0.01, (b, h, w, 1))
    x = jnp.where(_g(gates, "pixel_dropout") & drop, 0.0, x)

    # blur (A.Blur blur_limit=5: random box kernel 3 or 5, p=.5)
    pick5 = jax.random.bernoulli(keys[8], 0.5, (b, 1, 1, 1))
    blurred = jnp.where(pick5, _box_blur(x, 5), _box_blur(x, 3))
    x = jnp.where(_g(gates, "blur"), blurred, x)

    # coarse dropout: one random rectangle per image, filled white (p=.1)
    cy = jax.random.randint(keys[9], (b, 1, 1), 0, h)
    cx = jax.random.randint(keys[10], (b, 1, 1), 0, w)
    sz = h // 8
    gy = jax.lax.broadcasted_iota(jnp.int32, (b, h, w), 1)
    gx = jax.lax.broadcasted_iota(jnp.int32, (b, h, w), 2)
    hole = (jnp.abs(gy - cy) < sz) & (jnp.abs(gx - cx) < sz)
    x = jnp.where(_g(gates, "coarse_dropout") & hole[..., None], 1.0, x)

    # affine family, ONE composed matrix per image (white padding):
    #   zoom-out-only SSR (scale_limit (-0.1, 0), p=.5)
    #   shift-only SSR (shift_limit .05, p=.5)
    #   SafeRotate (limit 10deg, p=.1)
    akeys = jax.random.split(keys[11], b)
    g_zoom = gates["zoom_out"]
    g_shift = gates["shift"]
    g_rot = gates["safe_rotate"]

    def make_mat(k, gz, gs, gr):
        k1, k2, k3, k4 = jax.random.split(k, 4)
        # output->input matrix: sampling scale 1/s for content scale s
        s = jnp.where(gz, jax.random.uniform(k1, (), minval=0.9, maxval=1.0), 1.0)
        theta = jnp.where(
            gr, jax.random.uniform(k2, (), minval=-1.0, maxval=1.0) * (10.0 * jnp.pi / 180.0), 0.0)
        ty = jnp.where(gs, jax.random.uniform(k3, (), minval=-0.05, maxval=0.05) * h, 0.0)
        tx = jnp.where(gs, jax.random.uniform(k4, (), minval=-0.05, maxval=0.05) * w, 0.0)
        inv = 1.0 / s
        cyy, cxx = (h - 1) / 2.0, (w - 1) / 2.0
        cos_t, sin_t = jnp.cos(theta) * inv, jnp.sin(theta) * inv
        m02 = cyy - cos_t * cyy + sin_t * cxx + ty
        m12 = cxx - sin_t * cyy - cos_t * cxx + tx
        return jnp.array([[cos_t, -sin_t, m02], [sin_t, cos_t, m12]])

    mats = jax.vmap(make_mat)(akeys, g_zoom, g_shift, g_rot)
    any_affine = (g_zoom | g_shift | g_rot)[:, None, None, None]
    warped = jax.vmap(_affine_sample, in_axes=(0, 0))(x, mats)
    x = jnp.where(any_affine, warped, x)

    # perspective (A.Perspective scale ~.05, white padding, p=.3)
    ys = jnp.arange(h, dtype=jnp.float32)
    xs = jnp.arange(w, dtype=jnp.float32)
    gy_f, gx_f = jnp.meshgrid(ys, xs, indexing="ij")

    def perspective_one(img, k):
        k1, k2 = jax.random.split(k)
        # small projective terms about the image center
        py = jax.random.uniform(k1, (), minval=-0.1, maxval=0.1) / max(h, 1)
        px = jax.random.uniform(k2, (), minval=-0.1, maxval=0.1) / max(w, 1)
        cyy, cxx = (h - 1) / 2.0, (w - 1) / 2.0
        denom = 1.0 + py * (gy_f - cyy) + px * (gx_f - cxx)
        src_y = (gy_f - cyy) / denom + cyy
        src_x = (gx_f - cxx) / denom + cxx
        return _remap(img, src_y, src_x)

    pkeys = jax.random.split(keys[12], b)
    persp = jax.vmap(perspective_one)(x, pkeys)
    x = jnp.where(_g(gates, "perspective"), persp, x)

    # optical distortion (A.OpticalDistortion distort_limit .05, p=.5):
    # radial barrel/pincushion about the center, white padding
    def distort_one(img, k):
        kk = jax.random.uniform(k, (), minval=-0.05, maxval=0.05)
        cyy, cxx = (h - 1) / 2.0, (w - 1) / 2.0
        ny = (gy_f - cyy) / max(cyy, 1.0)
        nx = (gx_f - cxx) / max(cxx, 1.0)
        r2 = ny * ny + nx * nx
        f = 1.0 + kk * r2
        return _remap(img, cyy + ny * f * cyy, cxx + nx * f * cxx)

    dkeys = jax.random.split(keys[13], b)
    dist = jax.vmap(distort_one)(x, dkeys)
    x = jnp.where(_g(gates, "optical_distortion"), dist, x)

    return jnp.clip(x, 0.0, 1.0)
