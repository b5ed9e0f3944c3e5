"""Native C++ image loader vs PIL (decoders: PNG/BMP/PPM/baseline JPEG;
replaces the reference's cv2 decode path, descriptors.py:65, engine.py:42)."""

import io

import numpy as np
import pytest
from PIL import Image

from image_search_engine_tpu.utils import native_loader as NL

pytestmark = pytest.mark.skipif(not NL.available(), reason="native loader unavailable")


def _img(rng, h=37, w=53):
    return (rng.random((h, w, 3)) * 255).astype(np.uint8)


@pytest.mark.parametrize("fmt,kwargs", [("PNG", {}), ("BMP", {}), ("PPM", {})])
def test_lossless_formats_exact(rng, tmp_path, fmt, kwargs):
    arr = _img(rng)
    p = tmp_path / f"img.{fmt.lower()}"
    Image.fromarray(arr).save(p, format=fmt, **kwargs)
    got = NL.decode_file(p)
    assert got is not None
    np.testing.assert_array_equal(got, arr)


def test_png_palette_and_gray(rng, tmp_path):
    arr = _img(rng)
    pal = Image.fromarray(arr).convert("P", palette=Image.ADAPTIVE)
    p = tmp_path / "pal.png"
    pal.save(p)
    got = NL.decode_file(p)
    want = np.asarray(pal.convert("RGB"))
    np.testing.assert_array_equal(got, want)

    gray = Image.fromarray(arr).convert("L")
    g = tmp_path / "gray.png"
    gray.save(g)
    got = NL.decode_file(g)
    want = np.asarray(gray.convert("RGB"))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("subsampling", [0, 1, 2])  # 4:4:4, 4:2:2, 4:2:0
def test_jpeg_close_to_pil(rng, tmp_path, subsampling):
    from scipy.ndimage import gaussian_filter

    arr = (gaussian_filter(rng.random((48, 64, 3)), (3, 3, 0)) * 255).astype(np.uint8)
    p = tmp_path / "img.jpg"
    Image.fromarray(arr).save(p, format="JPEG", quality=92, subsampling=subsampling)
    got = NL.decode_file(p)
    assert got is not None and got.shape == arr.shape
    want = np.asarray(Image.open(p).convert("RGB")).astype(np.int16)
    # decoders may differ by a couple of levels (IDCT/rounding choices)
    diff = np.abs(got.astype(np.int16) - want)
    assert diff.mean() < 2.0 and diff.max() <= 12, (diff.mean(), diff.max())


def test_decode_bytes_matches_file(rng, tmp_path):
    arr = _img(rng)
    p = tmp_path / "x.png"
    Image.fromarray(arr).save(p)
    got = NL.decode_bytes(p.read_bytes())
    np.testing.assert_array_equal(got, arr)


def test_decode_garbage_returns_none():
    assert NL.decode_bytes(b"\x00\x01\x02 not an image") is None


def test_load_batch_parallel(rng, tmp_path):
    paths = []
    arrs = []
    for i in range(10):
        a = _img(rng, 40 + i, 30 + i)
        p = tmp_path / f"b{i}.png"
        Image.fromarray(a).save(p)
        paths.append(p)
        arrs.append(a)
    paths.append(tmp_path / "missing.png")  # error-skip parity
    out, ok = NL.load_batch(paths, 32, 32, n_threads=4)
    assert out.shape == (11, 32, 32, 3)
    assert ok[:10].all() and not ok[10]
    assert out.min() >= 0 and out.max() <= 1
    # resized content should correlate with a PIL resize
    want = np.asarray(Image.fromarray(arrs[0]).resize((32, 32), Image.BILINEAR), np.float32) / 255
    assert np.abs(out[0] - want).mean() < 0.03


def test_load_batch_u8_matches_f32(rng, tmp_path):
    paths = []
    for i in range(4):
        Image.fromarray(_img(rng, 40, 36)).save(tmp_path / f"u{i}.png")
        paths.append(tmp_path / f"u{i}.png")
    f32, ok_f = NL.load_batch(paths, 32, 32, n_threads=2)
    u8, ok_u = NL.load_batch_u8(paths, 32, 32, n_threads=2)
    assert u8.dtype == np.uint8 and ok_u.all() and ok_f.all()
    # u8 is the f32 resize rounded to the nearest 1/255 step
    assert np.abs(u8.astype(np.float32) / 255.0 - f32).max() <= 0.5 / 255 + 1e-6
