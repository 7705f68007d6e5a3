"""Pallas LK level kernel vs the jnp reference implementation.

Runs in interpreter mode on the CPU test platform; the compiled path is
exercised on TPU by the bench/front-end. The kernel must reproduce
frontend/klt._track_level for interior features (border clamping details
differ and are excluded by construction — the callers reject border features
either way, /root/reference/src/corner_detector.cpp:176-193)."""

import numpy as np
import jax.numpy as jnp
import pytest

from msckf_mono_tpu.frontend import klt
from msckf_mono_tpu.ops import klt_pallas


def _smooth_image(rng, shape, octaves=4):
    """Band-limited random image so LK has usable gradients everywhere."""
    img = np.zeros(shape, np.float32)
    for o in range(octaves):
        s = 2 ** (octaves - o)
        small = rng.uniform(0, 1, size=(shape[0] // s + 2, shape[1] // s + 2))
        up = np.kron(small, np.ones((s, s)))[: shape[0], : shape[1]]
        img += up.astype(np.float32) * (2.0**o)
    img -= img.min()
    return img * (255.0 / img.max())


def _shift_image(img, dx, dy):
    """Subpixel-shift by bilinear resampling (content moves by +dx, +dy)."""
    H, W = img.shape
    ys = np.clip(np.arange(H)[:, None] - dy, 0, H - 1.001)
    xs = np.clip(np.arange(W)[None, :] - dx, 0, W - 1.001)
    y0 = ys.astype(int)
    x0 = xs.astype(int)
    fy = ys - y0
    fx = xs - x0
    return (
        img[y0, x0] * (1 - fy) * (1 - fx)
        + img[y0, x0 + 1] * (1 - fy) * fx
        + img[y0 + 1, x0] * fy * (1 - fx)
        + img[y0 + 1, x0 + 1] * fy * fx
    ).astype(np.float32)


@pytest.mark.parametrize("window", [15, 31])
def test_level_matches_jnp(window):
    rng = np.random.default_rng(3)
    img0 = _smooth_image(rng, (96, 144))
    img1 = _shift_image(img0, 1.7, -1.2)

    F = 24
    pts = np.stack(
        [
            rng.uniform(30, 144 - 30, size=F),
            rng.uniform(30, 96 - 30, size=F),
        ],
        axis=-1,
    ).astype(np.float32)
    pred = pts + rng.normal(0, 1.0, size=(F, 2)).astype(np.float32)
    valid = np.ones(F, bool)
    valid[::7] = False

    half = window // 2
    ref_pts, ref_good = klt._track_level(
        jnp.asarray(img0), jnp.asarray(img1),
        jnp.asarray(pts), jnp.asarray(pred), jnp.asarray(valid),
        half, 30, 0.03, 1e-4,
    )
    out_pts, out_good = klt_pallas.track_level(
        jnp.asarray(img0), jnp.asarray(img1),
        jnp.asarray(pts), jnp.asarray(pred), jnp.asarray(valid),
        window_size=window, max_iters=30, eps=0.03,
        min_eigen_threshold=1e-4, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(out_good), np.asarray(ref_good))
    np.testing.assert_allclose(
        np.asarray(out_pts), np.asarray(ref_pts), atol=0.05
    )
    # and both actually recovered the planted flow
    got = np.asarray(out_pts)[np.asarray(out_good)] - pts[np.asarray(out_good)]
    np.testing.assert_allclose(got, np.tile([1.7, -1.2], (got.shape[0], 1)), atol=0.2)


def test_full_pyramid_matches_jnp():
    rng = np.random.default_rng(11)
    img0 = _smooth_image(rng, (120, 160))
    img1 = _shift_image(img0, -3.3, 2.6)

    F = 16
    pts = np.stack(
        [
            rng.uniform(40, 160 - 40, size=F),
            rng.uniform(40, 120 - 40, size=F),
        ],
        axis=-1,
    ).astype(np.float32)
    valid = np.ones(F, bool)

    p0 = klt.build_pyramid(jnp.asarray(img0), 3)
    p1 = klt.build_pyramid(jnp.asarray(img1), 3)

    ref_pts, ref_ok = klt.track_features_pyr(
        p0, p1, jnp.asarray(pts), jnp.asarray(pts), jnp.asarray(valid),
        window_size=15, use_pallas=False,
    )
    # interpret-mode pallas through the same driver
    from msckf_mono_tpu.ops import klt_pallas as kp
    import functools

    orig = kp.track_level
    try:
        kp.track_level = functools.partial(orig, interpret=True)
        out_pts, out_ok = klt.track_features_pyr(
            p0, p1, jnp.asarray(pts), jnp.asarray(pts), jnp.asarray(valid),
            window_size=15, use_pallas=True,
        )
    finally:
        kp.track_level = orig

    np.testing.assert_array_equal(np.asarray(out_ok), np.asarray(ref_ok))
    np.testing.assert_allclose(np.asarray(out_pts), np.asarray(ref_pts), atol=0.1)
    got = np.asarray(out_pts)[np.asarray(out_ok)] - pts[np.asarray(out_ok)]
    np.testing.assert_allclose(got, np.tile([-3.3, 2.6], (got.shape[0], 1)), atol=0.3)


def test_level_right_side_features_small_level():
    """Regression (round 4): the kernel clipped the window base to
    Wp - LANE - 1, which pins features with x + pad >= 128 to a wrong window
    at levels where the padded width is the 256 floor (e.g. pyramid level 2
    of 480x752) — tracked endpoints came out ~1-2 px off and dragged the
    image-pipeline ATE from 0.25 to 1.05 m. The roll is circular; the real
    bound is Wp - w - 3."""
    rng = np.random.default_rng(5)
    img0 = _smooth_image(rng, (120, 188))  # level-2-like: Wp floors at 256
    img1 = _shift_image(img0, 1.3, 0.8)
    xs = np.array([40.0, 120.0, 132.0, 150.0, 165.0, 174.0])
    ys = np.array([30.0, 55.0, 80.0, 95.0, 60.0, 40.0])
    pts = jnp.asarray(np.stack([xs, ys], -1), jnp.float32)
    valid = jnp.ones((len(xs),), bool)

    pj, gj = klt._track_level(
        jnp.asarray(img0), jnp.asarray(img1), pts, pts, valid, 10, 30, 1.0, 1e-5
    )
    pp, gp = klt_pallas.track_level(
        jnp.asarray(img0), jnp.asarray(img1), pts, pts, valid,
        window_size=21, max_iters=30, eps=1.0, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(gj), np.asarray(gp))
    d = np.linalg.norm(np.asarray(pp) - np.asarray(pj), axis=1)
    assert d.max() < 0.05, d
