"""Dense/keypoint descriptor ops: HOG, DAISY, Harris corners, ORB/SIFT/
BRISK-style descriptors (reference backend/descriptors.py:31-44, 207-275)."""

import numpy as np
import pytest

from image_search_engine_tpu.ops import corners as C
from image_search_engine_tpu.ops.daisy import daisy
from image_search_engine_tpu.ops.filters import gaussian_blur, gradients
from image_search_engine_tpu.ops.hog import hog


def checkerboard(h=128, w=128, sq=16):
    y, x = np.mgrid[:h, :w]
    return (((y // sq) + (x // sq)) % 2).astype(np.float32)


def test_gaussian_blur_preserves_mean(rng):
    img = rng.random((2, 32, 32)).astype(np.float32)
    out = np.asarray(gaussian_blur(img, 2.0))
    np.testing.assert_allclose(out.mean(), img.mean(), rtol=1e-2)
    assert out.std() < img.std()  # smoothing reduces variance


def test_gradients_match_numpy(rng):
    img = rng.random((16, 16)).astype(np.float32)
    gy, gx = gradients(img)
    ny, nx = np.gradient(img)
    np.testing.assert_allclose(np.asarray(gy), ny, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gx), nx, rtol=1e-4, atol=1e-5)


def test_hog_shape_and_invariants(rng):
    img = rng.random((128, 96)).astype(np.float32)
    f = np.asarray(hog(img, orientations=9, cell_size=32, block_size=2))
    # 4x3 cells -> 3x2 blocks x 4 cells x 9 bins
    assert f.shape == (3 * 2 * 4 * 9,)
    assert (f >= 0).all() and (f <= 0.3).all()  # L2-Hys clips at 0.2 pre-renorm
    batch = np.asarray(hog(np.stack([img, img])))
    np.testing.assert_allclose(batch[0], batch[1])
    np.testing.assert_allclose(batch[0], f)


def test_hog_flat_image_is_zero():
    img = np.full((64, 64), 0.5, np.float32)
    f = np.asarray(hog(img, cell_size=32))
    np.testing.assert_allclose(f, 0.0, atol=1e-5)


def test_daisy_shape_matches_reference_config(rng):
    img = rng.random((224, 224)).astype(np.float32)
    d = np.asarray(daisy(img, step=32, radius=32, rings=2, histograms=8, orientations=8))
    # (rings*histograms+1)*orientations = 136, like skimage's (descriptors.py:238-254)
    assert d.shape[1] == 136
    assert d.shape[0] == len(range(32, 224 - 32, 32)) ** 2
    # l1-normalized histogram blocks
    np.testing.assert_allclose(np.abs(d).sum(-1), 1.0, rtol=1e-3)


def test_daisy_translation_consistency(rng):
    # two overlapping crops offset by exactly one grid step: descriptors at
    # corresponding interior grid points must agree (true translation, no
    # border/wrap effects)
    big = rng.random((256, 256)).astype(np.float32)
    a = big[0:192, 0:192]
    b = big[32:224, 0:192]
    da = np.asarray(daisy(a, step=32, radius=32))
    db = np.asarray(daisy(b, step=32, radius=32))
    n = len(range(32, 192 - 32, 32))  # 4 grid rows/cols
    dag = da.reshape(n, n, -1)
    dbg = db.reshape(n, n, -1)
    # a's grid row y=64.. maps to b's row y=32.. ; compare interior rows
    # away from blur reach of the crop borders
    np.testing.assert_allclose(dag[2, 2], dbg[1, 2], atol=2e-3)
    np.testing.assert_allclose(dag[3, 2], dbg[2, 2], atol=2e-3)


def test_harris_detects_checkerboard_corners():
    img = checkerboard()[None]
    kp = C.detect(img, max_keypoints=64)
    ys, xs, valid = np.asarray(kp.ys[0]), np.asarray(kp.xs[0]), np.asarray(kp.valid[0])
    assert valid.sum() >= 10
    # detected corners sit near multiples of the square size
    near = (np.abs((ys[valid] % 16)) <= 2) | (np.abs(16 - (ys[valid] % 16)) <= 2)
    assert near.mean() > 0.8


def test_detect_valid_mask_on_flat_image():
    img = np.full((1, 96, 96), 0.7, np.float32)
    kp = C.detect(img, max_keypoints=32)
    assert np.asarray(kp.valid).sum() == 0


@pytest.mark.parametrize("kind,dim", [("orb", 256), ("sift", 128), ("brisk", 512)])
def test_descriptors_shapes_and_determinism(rng, kind, dim):
    img = rng.random((1, 128, 128)).astype(np.float32)
    d1, v1 = C.detect_and_describe(img, kind, max_keypoints=32)
    d2, v2 = C.detect_and_describe(img, kind, max_keypoints=32)
    assert d1.shape == (1, 32, dim)
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))
    if kind in ("orb", "brisk"):
        vals = np.unique(np.asarray(d1))
        assert set(vals.tolist()) <= {0.0, 1.0}


def test_descriptor_matching_across_noise(rng):
    # same image + slight noise: descriptors at same keypoints should match
    # far better than descriptors of a different image
    base = checkerboard(128, 128) * 0.8 + 0.1
    base += 0.02 * rng.standard_normal((128, 128)).astype(np.float32)
    noisy = base + 0.02 * rng.standard_normal((128, 128)).astype(np.float32)
    other = rng.random((128, 128)).astype(np.float32)
    imgs = np.stack([base, noisy, other])
    d, v = C.detect_and_describe(imgs.astype(np.float32), "sift", max_keypoints=16)
    d = np.asarray(d)
    sim_same = np.abs(d[0] @ d[1].T).max(1).mean()
    sim_other = np.abs(d[0] @ d[2].T).max(1).mean()
    assert sim_same > sim_other


def test_describe_dataset_cache_invalidated_on_corpus_change(rng, tmp_path):
    # review finding: stale cache must not survive a corpus change
    from PIL import Image

    from image_search_engine_tpu.descriptors import HOGDescriptor, describe_dataset

    paths = []
    for i in range(3):
        p = tmp_path / f"i{i}.png"
        Image.fromarray((rng.random((40, 40, 3)) * 255).astype(np.uint8)).save(p)
        paths.append(p)
    cache = tmp_path / "cache.npz"
    f1, _, k1 = describe_dataset(HOGDescriptor(), paths, 32, 2, cache_path=cache)
    # same corpus -> cache hit
    f2, _, _ = describe_dataset(HOGDescriptor(), paths, 32, 2, cache_path=cache)
    np.testing.assert_array_equal(f1, f2)
    # changed corpus -> rebuild, not stale reuse
    p_new = tmp_path / "new.png"
    Image.fromarray((rng.random((40, 40, 3)) * 255).astype(np.uint8)).save(p_new)
    f3, _, k3 = describe_dataset(HOGDescriptor(), paths + [p_new], 32, 2, cache_path=cache)
    assert f3.shape[0] == 4 and len(k3) == 4


def test_describe_dataset_cache_invalidated_on_param_change(rng, tmp_path, caplog):
    # descriptor PARAMS are part of the cache key: re-indexing the same
    # corpus at a different pyramid depth / keypoint budget must rebuild,
    # not silently serve stale-geometry features
    import logging

    from PIL import Image

    from image_search_engine_tpu.descriptors import (CornerDescriptor,
                                                     describe_dataset)

    paths = []
    for i in range(2):
        p = tmp_path / f"i{i}.png"
        Image.fromarray((rng.random((48, 48, 3)) * 255).astype(np.uint8)).save(p)
        paths.append(p)
    cache = tmp_path / "cache.npz"
    logger = "image_search_engine_tpu.descriptors"
    describe_dataset(CornerDescriptor("orb", max_keypoints=32, n_levels=1),
                     paths, 48, 2, cache_path=cache)
    with caplog.at_level(logging.INFO, logger=logger):
        describe_dataset(CornerDescriptor("orb", max_keypoints=32, n_levels=1),
                         paths, 48, 2, cache_path=cache)
    assert any("loaded cached" in r.message for r in caplog.records)
    caplog.clear()
    with caplog.at_level(logging.INFO, logger=logger):
        describe_dataset(CornerDescriptor("orb", max_keypoints=32, n_levels=2),
                         paths, 48, 2, cache_path=cache)
    assert any("stale" in r.message for r in caplog.records)
    assert not any("loaded cached" in r.message for r in caplog.records)


def test_multiscale_pyramid_budgets():
    from image_search_engine_tpu.ops.corners import _level_budgets

    for mk, nl in ((256, 4), (100, 3), (64, 4)):
        b = _level_budgets(mk, nl, 1.25)
        assert sum(b) == mk and all(v >= 8 for v in b)
        assert b == sorted(b, reverse=True)  # base level gets the most
    # budgets below the per-level floor of 8 collapse to one base level
    # instead of crashing (regression: the rebalance loop used to empty
    # the budget array for max_keypoints < 8)
    for mk in (1, 4, 7, 8, 9):
        b = _level_budgets(mk, 4, 1.25)
        assert sum(b) == mk and all(v >= 1 for v in b)


def test_multiscale_shapes_and_small_image_fallback(rng):
    from image_search_engine_tpu.ops.corners import detect_and_describe

    img = rng.random((2, 128, 128)).astype(np.float32)
    d, v = detect_and_describe(img, "orb", max_keypoints=96, n_levels=4)
    assert d.shape == (2, 96, 256) and v.shape == (2, 96)

    # image too small for a pyramid: silently single-scale
    tiny = rng.random((2, 80, 80)).astype(np.float32)
    d2, v2 = detect_and_describe(tiny, "orb", max_keypoints=64, n_levels=4)
    assert d2.shape == (2, 64, 256)


def test_multiscale_improves_scale_robustness(rng):
    """A checkerboard-textured image vs its 1.5x-downscaled self: with a
    pyramid, descriptor sets should match better (smaller mean nearest-
    descriptor distance) than single-scale detection."""
    import jax.numpy as jnp

    from image_search_engine_tpu.ops.corners import detect_and_describe

    # textured synthetic image (random blobs + checker to give corners)
    base = rng.random((12, 12)).astype(np.float32)
    img = np.kron(base, np.ones((16, 16), np.float32))  # 192x192 checker
    img += 0.1 * rng.standard_normal(img.shape).astype(np.float32)
    img = np.clip(img, 0, 1)
    small = np.asarray(
        jnp.squeeze(
            jnp.asarray(img)[None, :, :, None]
        )
    )
    import jax

    scaled = np.asarray(jax.image.resize(jnp.asarray(img), (128, 128), "bilinear"))

    def mean_nn_dist(n_levels):
        d1, v1 = detect_and_describe(img[None], "sift", 64, n_levels=n_levels)
        d2, v2 = detect_and_describe(scaled[None], "sift", 64, n_levels=n_levels)
        a = np.asarray(d1[0])[np.asarray(v1[0])]
        b = np.asarray(d2[0])[np.asarray(v2[0])]
        dist = ((a[:, None] - b[None]) ** 2).sum(-1)
        return float(dist.min(axis=1).mean())

    assert mean_nn_dist(4) < mean_nn_dist(1)


def test_describe_batch_uint8_matches_f32(rng):
    """uint8 corpora cast on device (ops/image_ops.to_unit_f32); the
    descriptors must not care which dtype arrived."""
    from image_search_engine_tpu.descriptors import CornerDescriptor, DaisyDescriptor

    u8 = rng.integers(0, 256, (2, 96, 96, 3), dtype=np.uint8)
    f32 = u8.astype(np.float32) / 255.0
    for desc in (CornerDescriptor("orb", 32, n_levels=2),
                 DaisyDescriptor(step=32)):
        du, vu = desc.describe_batch(u8)
        df, vf = desc.describe_batch(f32)
        np.testing.assert_allclose(du, df, rtol=1e-5, atol=1e-6)
        np.testing.assert_array_equal(vu, vf)
