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

ALL geometric ops compose into ONE bilinear resample: the three affine
ops (zoom-out, shift, rotate) fold into a single matrix per image, and
the perspective + optical-distortion coordinate maps are composed with
it on the sampling GRID (the last image-space pass transforms the grid
first), so the batch pays exactly one gather pass however many
geometric ops fire. This matters: the bilinear gathers are the train
step's dominant cost on TPU (XLA lowers fancy-index gathers to slow
element gathers — the 3-pass version alone measured 349 ms at batch 32
x 352x256, more than the whole DenseNet121 fwd+bwd; BENCH_NOTES
"Device-side augmentation"). Composing maps instead of iterating
resamples is also strictly sharper (one interpolation, not three).
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


_REMAP_CHUNK = 8  # images per gather (operand ~35 MB at 352x256 — past
# that XLA's TPU gather falls off a ~3x cliff; benchmarks/remap_variants.py)


def _remap_patch(imgs: jnp.ndarray, src_y: jnp.ndarray, src_x: jnp.ndarray,
                 fill: float = 1.0) -> jnp.ndarray:
    """Bilinear-sample a (B, H, W, C) batch at per-image (B, H, W) source
    grids with ONE gather for all four corner taps: each row of the flat
    operand holds the 2x2 edge-replicated patch at that pixel (4C
    values), so the gather touches 4x fewer rows than tap-by-tap — and on
    TPU a gathered row costs a full memory tile regardless of payload
    (measured 3.6x: 51 -> 14 ms at batch 32 x 352x256,
    benchmarks/remap_variants.py). Out-of-bounds fills WHITE (the
    reference's card-image padding)."""
    b, h, w, c = imgs.shape
    right = jnp.concatenate([imgs[:, :, 1:], imgs[:, :, -1:]], axis=2)
    down = jnp.concatenate([imgs[:, 1:], imgs[:, -1:]], axis=1)
    dright = jnp.concatenate([down[:, :, 1:], down[:, :, -1:]], axis=2)
    patches = jnp.concatenate([imgs, right, down, dright], axis=-1)
    flat = patches.reshape(b * h * w, 4 * c)

    y0 = jnp.floor(src_y).astype(jnp.int32)
    x0 = jnp.floor(src_x).astype(jnp.int32)
    wy = (src_y - y0)[..., None]
    wx = (src_x - x0)[..., None]
    yc = jnp.clip(y0, 0, h - 1)
    xc = jnp.clip(x0, 0, w - 1)
    base = (jnp.arange(b, dtype=jnp.int32) * (h * w))[:, None, None]
    idx = (base + yc * w + xc).reshape(-1)
    tap = jnp.take(flat, idx, axis=0).reshape(b, h, w, 4, c)
    out = (
        tap[..., 0, :] * ((1 - wy) * (1 - wx))
        + tap[..., 1, :] * ((1 - wy) * wx)
        + tap[..., 2, :] * (wy * (1 - wx))
        + tap[..., 3, :] * (wy * wx)
    )
    inside = (
        (src_y >= 0) & (src_y <= h - 1) & (src_x >= 0) & (src_x <= w - 1)
    )[..., None]
    return jnp.where(inside, out, fill)


def _remap_batch(imgs: jnp.ndarray, src_y: jnp.ndarray, src_x: jnp.ndarray,
                 fill: float = 1.0) -> jnp.ndarray:
    """``_remap_patch`` over ``_REMAP_CHUNK``-image chunks: big batches
    gather chunk-by-chunk so the flat operand stays below the TPU gather
    cliff (batch 128 x 352x256: 603 -> 59 ms vs one global gather)."""
    b, h, w, c = imgs.shape
    nc = _REMAP_CHUNK
    if b <= nc:
        return _remap_patch(imgs, src_y, src_x, fill)
    bp = ((b + nc - 1) // nc) * nc
    if bp != b:
        pad = bp - b
        imgs = jnp.concatenate(
            [imgs, jnp.zeros((pad, h, w, c), imgs.dtype)])
        src_y = jnp.concatenate([src_y, jnp.zeros((pad, h, w), src_y.dtype)])
        src_x = jnp.concatenate([src_x, jnp.zeros((pad, h, w), src_x.dtype)])
    out = jax.lax.map(
        lambda t: _remap_patch(*t, fill=fill),
        (imgs.reshape(bp // nc, nc, h, w, c),
         src_y.reshape(bp // nc, nc, h, w),
         src_x.reshape(bp // nc, nc, h, w)),
    ).reshape(bp, h, w, c)
    return out[:b]


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

    # ---- geometric family: everything composes into ONE resample ----
    # Sequential image-space order is affine -> perspective -> optical
    # distortion, so the output->source coordinate map composes in
    # reverse: grid -> distortion map -> perspective map -> affine map,
    # then a single bilinear sample. Ungated ops contribute exact-identity
    # parameters (zero distortion / zero projective terms / identity
    # matrix), so gating happens on the cheap (B,) parameter vectors, not
    # on resampled images.
    cyy, cxx = (h - 1) / 2.0, (w - 1) / 2.0
    ys = jnp.arange(h, dtype=jnp.float32)
    xs = jnp.arange(w, dtype=jnp.float32)
    gy0, gx0 = jnp.meshgrid(ys, xs, indexing="ij")
    gy = jnp.broadcast_to(gy0, (b, h, w))
    gx = jnp.broadcast_to(gx0, (b, h, w))

    # optical distortion (A.OpticalDistortion distort_limit .05, p=.5):
    # radial barrel/pincushion about the center
    kk = jnp.where(
        gates["optical_distortion"],
        jax.random.uniform(keys[13], (b,), minval=-0.05, maxval=0.05),
        0.0,
    )[:, None, None]
    ny = (gy - cyy) / max(cyy, 1.0)
    nx = (gx - cxx) / max(cxx, 1.0)
    f = 1.0 + kk * (ny * ny + nx * nx)
    gy = cyy + ny * f * cyy
    gx = cxx + nx * f * cxx

    # perspective (A.Perspective scale ~.05, p=.3): small projective
    # terms about the image center
    kp1, kp2 = jax.random.split(keys[12])
    g_persp = gates["perspective"]
    py = jnp.where(
        g_persp, jax.random.uniform(kp1, (b,), minval=-0.1, maxval=0.1), 0.0
    )[:, None, None] / max(h, 1)
    px = jnp.where(
        g_persp, jax.random.uniform(kp2, (b,), minval=-0.1, maxval=0.1), 0.0
    )[:, None, None] / max(w, 1)
    denom = 1.0 + py * (gy - cyy) + px * (gx - cxx)
    gy = (gy - cyy) / denom + cyy
    gx = (gx - cxx) / denom + cxx

    # affine family, ONE composed matrix per image:
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
        cos_t, sin_t = jnp.cos(theta) * inv, jnp.sin(theta) * inv
        m02 = cyy - cos_t * cyy + sin_t * cxx + ty
        m12 = cxx - sin_t * cyy - cos_t * cxx + tx
        return jnp.array([[cos_t, -sin_t, m02], [sin_t, cos_t, m12]])

    mats = jax.vmap(make_mat)(akeys, g_zoom, g_shift, g_rot)  # (B, 2, 3)
    m = mats[:, :, :, None, None]  # (B, 2, 3, 1, 1)
    gy, gx = (
        m[:, 0, 0] * gy + m[:, 0, 1] * gx + m[:, 0, 2],
        m[:, 1, 0] * gy + m[:, 1, 1] * gx + m[:, 1, 2],
    )

    any_geo = (
        g_zoom | g_shift | g_rot | g_persp | gates["optical_distortion"]
    )[:, None, None, None]
    warped = _remap_batch(x, gy, gx)
    x = jnp.where(any_geo, warped, x)

    return jnp.clip(x, 0.0, 1.0)
