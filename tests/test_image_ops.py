"""Regression tests for the matmul image ops (round 5).

pyrDown and the dense Shi-Tomasi response were rewritten from shift-add /
double-cumsum forms into banded-matrix matmuls (frontend/klt.py:_pyr_down,
frontend/detect.py:shi_tomasi_score) — the TPU-native form (lane-axis
shifts and stride-2 lane slices lower to full-image relayouts; measured
163 ms vs ~5 ms per 64-image batch on v5e). These tests pin the matmul
forms to the original definitions so the rewrite can never drift:

* pyrDown == 5-tap [1,4,6,4,1]/16 edge-clamped separable blur + 2x
  subsample (cv2 buildOpticalFlowPyramid semantics,
  /root/reference/src/corner_detector.cpp:136-194 tracks through
  cv::calcOpticalFlowPyrLK's pyramids), to f32 rounding;
* the custom_vmap rule folds batches into matmul dims without changing
  values, and an UNBATCHED image under vmap stays unbatched (the
  shared-camera pipeline relies on this to keep ONE pyramid);
* Shi-Tomasi == windowed min-eigenvalue with the reference's clipped
  [v-half, v+half) box (corner_detector.cpp:38-79), vs a brute-force
  direct evaluation.
"""

from __future__ import annotations

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from msckf_mono_tpu.frontend import detect, klt  # noqa: E402


def _ref_pyr_down(img):
    """The original shift-add formulation (exact 5-tap edge-clamped blur)."""
    k = jnp.asarray([1.0, 4.0, 6.0, 4.0, 1.0], img.dtype) / 16.0
    p = jnp.pad(img, ((2, 2), (0, 0)), mode="edge")
    img_v = sum(p[i : i + img.shape[0], :] * k[i] for i in range(5))
    p = jnp.pad(img_v, ((0, 0), (2, 2)), mode="edge")
    img_h = sum(p[:, i : i + img.shape[1]] * k[i] for i in range(5))
    return img_h[::2, ::2]


@pytest.mark.parametrize("shape", [(480, 752), (120, 188), (31, 47)])
def test_pyr_down_matches_shift_add(shape):
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 255, shape).astype(np.float32))
    ref = np.asarray(_ref_pyr_down(img))
    out = np.asarray(klt._pyr_down(img))
    assert out.shape == ref.shape
    # 1 f32 ulp at intensity 255
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_pyr_down_vmap_folds_batch():
    rng = np.random.default_rng(1)
    imgs = jnp.asarray(rng.uniform(0, 255, (5, 64, 48)).astype(np.float32))
    single = np.stack([np.asarray(klt._pyr_down(imgs[i])) for i in range(5)])
    batched = np.asarray(jax.jit(jax.vmap(klt._pyr_down))(imgs))
    np.testing.assert_array_equal(batched, single)


def test_pyr_down_unbatched_under_vmap_stays_shared():
    """in_axes=None (shared camera) must produce ONE pyramid, not B copies —
    the output of a vmapped closure over an unbatched image is broadcast
    AFTER the op, so values must still match the single-image call."""
    rng = np.random.default_rng(2)
    img = jnp.asarray(rng.uniform(0, 255, (64, 48)).astype(np.float32))
    single = np.asarray(klt._pyr_down(img))
    under_vmap = np.asarray(
        jax.vmap(lambda _: klt._pyr_down(img))(jnp.arange(3.0))
    )
    assert under_vmap.shape == (3,) + single.shape
    np.testing.assert_array_equal(under_vmap[0], single)
    np.testing.assert_array_equal(under_vmap[2], single)


def test_pyramid_level_shapes():
    img = jnp.zeros((480, 752), jnp.float32)
    pyr = klt.build_pyramid(img, 4)
    assert tuple(p.shape for p in pyr) == (
        (480, 752), (240, 376), (120, 188), (60, 94), (30, 47)
    )


def _brute_shi_tomasi(img, halfbox=15):
    """Direct evaluation of the reference's windowed min-eigenvalue
    (corner_detector.cpp:38-79): central-difference gradients, box
    [v-half, v+half) x [u-half, u+half) clipped to the image."""
    H, W = img.shape
    dx = np.zeros_like(img)
    dy = np.zeros_like(img)
    dx[:, 1:-1] = img[:, 2:] - img[:, :-2]
    dy[1:-1, :] = img[2:, :] - img[:-2, :]
    box_area = (2 * halfbox) ** 2
    out = np.zeros_like(img)
    for v in range(H):
        if v - halfbox < 1 or v + halfbox >= H - 1:
            continue
        for u in range(W):
            if u - halfbox < 1 or u + halfbox >= W - 1:
                continue
            ys = slice(max(v - halfbox, 0), min(v + halfbox, H))
            xs = slice(max(u - halfbox, 0), min(u + halfbox, W))
            gx = dx[ys, xs]
            gy = dy[ys, xs]
            dxx = float(np.sum(gx * gx)) / (2.0 * box_area)
            dyy = float(np.sum(gy * gy)) / (2.0 * box_area)
            dxy = float(np.sum(gx * gy)) / (2.0 * box_area)
            tr = dxx + dyy
            det = dxx * dyy - dxy * dxy
            disc = np.sqrt(max(tr * tr - 4 * det, 0.0))
            out[v, u] = 0.5 * (tr - disc)
    return out


def test_shi_tomasi_matches_brute_force():
    rng = np.random.default_rng(3)
    img = rng.uniform(0, 255, (48, 56)).astype(np.float32)
    img[20:30, 25:35] += 100.0
    ref = _brute_shi_tomasi(img)
    out = np.asarray(detect.shi_tomasi_score(jnp.asarray(img)))
    # f32 accumulation-order noise scales with response magnitude (~6e3 at
    # the synthetic corner): relative tolerance, floored for flat regions
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=2e-3)


def test_shi_tomasi_precision_tiers_agree_loosely():
    """The bf16 serving tier must stay within ~1% of exact f32 — enough for
    per-cell argmax selection (detection), never for exact parity."""
    rng = np.random.default_rng(4)
    img = jnp.asarray(rng.uniform(0, 255, (96, 128)).astype(np.float32))
    hi = np.asarray(detect.shi_tomasi_score(img, precision="highest"))
    lo = np.asarray(detect.shi_tomasi_score(img, precision="default"))
    denom = np.maximum(np.abs(hi), 10.0)
    assert np.max(np.abs(hi - lo) / denom) < 0.02
