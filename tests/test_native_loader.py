"""Native ingestion runtime (native/loader.cpp via ctypes): CSV parser,
grayscale decoders, and the prefetching image pipeline — validated against
numpy/PIL references."""

import os

import numpy as np
import pytest

from msckf_mono_tpu.data import native_loader

pytestmark = pytest.mark.skipif(
    not native_loader.available(), reason="native loader not built (make -C native)"
)


def _write_png(path, arr):
    from PIL import Image

    Image.fromarray(arr).save(path)


def test_csv_parse_matches_numpy(tmp_path):
    rng = np.random.default_rng(0)
    data = rng.normal(size=(500, 7)) * np.array([1e18, 1, 1, 1, 9, 9, 9])
    p = tmp_path / "data.csv"
    with open(p, "w") as f:
        f.write("#timestamp,wx,wy,wz,ax,ay,az\n")
        for row in data:
            f.write(",".join(repr(float(v)) for v in row) + "\n")
        f.write("\n")  # trailing blank line
    out = native_loader.parse_csv(str(p), 7)
    assert out.shape == (500, 7)
    np.testing.assert_allclose(out, data, rtol=1e-15)


def test_csv_short_rows_zero_padded(tmp_path):
    p = tmp_path / "short.csv"
    p.write_text("1,2\n3,4,5,6\n# comment\n7\n")
    out = native_loader.parse_csv(str(p), 4)
    np.testing.assert_allclose(
        out, [[1, 2, 0, 0], [3, 4, 5, 6], [7, 0, 0, 0]]
    )


def test_png_gray_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, size=(48, 64), dtype=np.uint8)
    p = tmp_path / "img.png"
    _write_png(str(p), img)
    out = native_loader.imread_gray(str(p))
    np.testing.assert_array_equal(out, img)
    # with explicit dims
    out2 = native_loader.imread_gray(str(p), 64, 48)
    np.testing.assert_array_equal(out2, img)


def test_png_rgb_to_gray(tmp_path):
    rng = np.random.default_rng(2)
    rgb = rng.integers(0, 256, size=(32, 40, 3), dtype=np.uint8)
    p = tmp_path / "rgb.png"
    _write_png(str(p), rgb)
    out = native_loader.imread_gray(str(p))
    from PIL import Image

    ref = np.asarray(Image.open(str(p)).convert("L")).astype(int)
    # both use BT.601 luma; allow rounding differences
    assert np.abs(out.astype(int) - ref).max() <= 1


def test_pgm_decode(tmp_path):
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(24, 36), dtype=np.uint8)
    p = tmp_path / "img.pgm"
    with open(p, "wb") as f:
        f.write(b"P5\n# a comment\n36 24\n255\n")
        f.write(img.tobytes())
    out = native_loader.imread_gray(str(p))
    np.testing.assert_array_equal(out, img)


def test_prefetcher_sequential_and_seek(tmp_path):
    rng = np.random.default_rng(4)
    imgs = [rng.integers(0, 256, size=(20, 30), dtype=np.uint8) for _ in range(12)]
    paths = []
    for i, im in enumerate(imgs):
        p = tmp_path / f"f{i:03d}.png"
        _write_png(str(p), im)
        paths.append(str(p))

    with native_loader.ImagePrefetcher(paths, 30, 20, n_threads=3, lookahead=4) as pf:
        # sequential
        for i in range(12):
            np.testing.assert_array_equal(pf.get(i), imgs[i])
        # backward seek
        np.testing.assert_array_equal(pf.get(2), imgs[2])
        # forward jump past the ring
        np.testing.assert_array_equal(pf.get(10), imgs[10])
        # repeat after seek keeps working
        np.testing.assert_array_equal(pf.get(11), imgs[11])


def test_prefetcher_decode_error(tmp_path):
    bad = tmp_path / "bad.png"
    bad.write_bytes(b"\x89Pnot-a-real-png")
    with native_loader.ImagePrefetcher([str(bad)], 10, 10) as pf:
        with pytest.raises(IOError):
            pf.get(0)


def test_size_mismatch(tmp_path):
    img = np.zeros((8, 8), np.uint8)
    p = tmp_path / "small.png"
    _write_png(str(p), img)
    with pytest.raises(IOError):
        native_loader.imread_gray(str(p), 16, 16)
