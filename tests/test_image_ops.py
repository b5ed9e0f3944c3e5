"""Image preprocessing + perceptual hash ops."""

import numpy as np
import pytest

from image_search_engine_tpu.ops import image_ops as I
from image_search_engine_tpu.ops import dhash as DH


def test_resize_shapes(rng):
    img = rng.random((2, 37, 53, 3)).astype(np.float32)
    out = np.asarray(I.resize(img, 224, 224))
    assert out.shape == (2, 224, 224, 3)
    single = np.asarray(I.resize(img[0], 16, 24))
    assert single.shape == (16, 24, 3)


def test_normalize_imagenet(rng):
    img = rng.random((4, 4, 3)).astype(np.float32)
    out = np.asarray(I.normalize_imagenet(img))
    want = (img - np.array(I.IMAGENET_MEAN)) / np.array(I.IMAGENET_STD)
    np.testing.assert_allclose(out, want, rtol=1e-4, atol=1e-6)


def test_rgb_to_gray_matches_bt601(rng):
    img = rng.random((5, 6, 3)).astype(np.float32)
    out = np.asarray(I.rgb_to_gray(img))
    want = img @ np.array([0.299, 0.587, 0.114], np.float32)
    np.testing.assert_allclose(out, want, rtol=1e-5)


def test_rgb_to_hsv_matches_colorsys(rng):
    import colorsys

    img = rng.random((10, 1, 3)).astype(np.float32)
    out = np.asarray(I.rgb_to_hsv(img))
    for i in range(10):
        r, g, b = img[i, 0]
        h, s, v = colorsys.rgb_to_hsv(r, g, b)
        np.testing.assert_allclose(out[i, 0, 0], h * 360.0, atol=1e-3)
        np.testing.assert_allclose(out[i, 0, 1], s, atol=1e-5)
        np.testing.assert_allclose(out[i, 0, 2], v, atol=1e-5)


def test_hsv_histogram_sums_to_one(rng):
    hsv = np.stack(
        [rng.random((8, 8)) * 360, rng.random((8, 8)), rng.random((8, 8))], axis=-1
    ).astype(np.float32)
    mask = np.ones((8, 8), np.float32)
    h = np.asarray(I.hsv_histogram_3d(hsv, mask))
    assert h.shape == (8 * 12 * 3,)
    np.testing.assert_allclose(h.sum(), 1.0, rtol=1e-5)


def test_five_region_masks_cover_image():
    masks = np.asarray(I.five_region_masks(32, 48))
    assert masks.shape == (5, 32, 48)
    # corner masks + ellipse partition the image (no overlap, full cover)
    total = masks.sum(0)
    np.testing.assert_array_equal(total, np.ones((32, 48)))


def test_dhash_robust_to_small_noise_and_distinct(rng):
    a = rng.random((32, 32, 3)).astype(np.float32)
    # smooth it so tiny noise doesn't flip gradient signs
    from scipy.ndimage import gaussian_filter

    a = gaussian_filter(a, sigma=(4, 4, 0)).astype(np.float32)
    b = np.clip(a + 0.002 * rng.standard_normal(a.shape).astype(np.float32), 0, 1)
    c = gaussian_filter(rng.random((32, 32, 3)), sigma=(4, 4, 0)).astype(np.float32)
    ha, hb, hc = DH.dhash_images(np.stack([a, b, c]))
    bits = DH.int_to_bits(np.array([ha, hb, hc]))
    d_ab = (bits[0] ^ bits[1]).sum()
    d_ac = (bits[0] ^ bits[2]).sum()
    assert d_ab < d_ac


def test_bits_int_roundtrip(rng):
    bits = rng.random((7, 64)) > 0.5
    ints = DH.bits_to_int(bits)
    back = DH.int_to_bits(ints)
    np.testing.assert_array_equal(bits, back)


def test_hamming_scan_matches_numpy(rng):
    q = rng.random((3, 64)) > 0.5
    db = rng.random((20, 64)) > 0.5
    got = np.asarray(DH.hamming_scan(q, db))
    want = (q[:, None, :] ^ db[None, :, :]).sum(-1)
    np.testing.assert_array_equal(got, want)


def test_hamming_topk_self_is_zero(rng):
    db = rng.random((10, 64)) > 0.5
    d, i = DH.hamming_topk(db[:2], db, 1)
    np.testing.assert_array_equal(i[:, 0], [0, 1])
    np.testing.assert_array_equal(d[:, 0], [0, 0])


def test_color_moment_hash_invariance(rng):
    from image_search_engine_tpu.ops.color_moment_hash import color_moment_hash
    from scipy.ndimage import gaussian_filter

    a = gaussian_filter(rng.random((32, 32, 3)), (4, 4, 0)).astype(np.float32)
    b = np.roll(a, (3, 5), axis=(0, 1))  # translation: Hu moments invariant
    c = gaussian_filter(rng.random((32, 32, 3)), (4, 4, 0)).astype(np.float32)
    h = np.asarray(color_moment_hash(np.stack([a, b, c])))
    assert h.shape == (3, 42)
    d_ab = np.abs(h[0] - h[1]).sum()
    d_ac = np.abs(h[0] - h[2]).sum()
    assert d_ab < d_ac


def test_chi2_flat_index(rng):
    from image_search_engine_tpu.index.flat import FlatIndex
    from tests.test_distances import brute_topk

    x = np.abs(rng.standard_normal((80, 16))).astype(np.float32)
    q = np.abs(rng.standard_normal((4, 16))).astype(np.float32)
    idx = FlatIndex("chi2").add(x)
    d, i = idx.search(q, 5)
    bd, bi = brute_topk(q, x, 5, "chi2")
    np.testing.assert_array_equal(i, bi)
    np.testing.assert_allclose(d, bd, rtol=1e-4, atol=1e-4)
