"""Pallas FAST-10 + NMS kernel vs the jnp reference implementation.

Runs in interpreter mode on the CPU test platform; the compiled path is
exercised on TPU by the bench/front-end."""

import numpy as np
import jax.numpy as jnp
import pytest

from msckf_mono_tpu.frontend import detect
from msckf_mono_tpu.ops import fast_pallas


def _reference_nms_score(img, threshold):
    mask, score = detect.fast_score_10(jnp.asarray(img, jnp.float32), threshold)
    keep = detect.nonmax_3x3(score, mask)
    return np.where(np.asarray(keep), np.asarray(score), 0.0)


@pytest.mark.parametrize("shape", [(64, 96), (120, 160), (201, 300)])
def test_matches_jnp_reference(shape):
    rng = np.random.default_rng(7)
    img = rng.uniform(0, 255, size=shape).astype(np.float32)
    # plant strong corners
    for y, x in [(20, 30), (40, 70), (shape[0] - 10, shape[1] - 20)]:
        img[y - 2 : y + 3, x - 2 : x + 3] = 10.0
        img[y, x] = 250.0

    ref = _reference_nms_score(img, 20.0)
    out = np.asarray(
        fast_pallas.fast_nms_score(jnp.asarray(img), 20.0, tile_h=48, interpret=True)
    )
    np.testing.assert_allclose(out, ref, atol=1e-4)
    assert (ref > 0).sum() > 0  # fixture actually has corners


def test_flat_image_no_corners():
    img = np.full((80, 100), 128.0, np.float32)
    out = np.asarray(fast_pallas.fast_nms_score(jnp.asarray(img), 20.0, tile_h=40, interpret=True))
    assert (out > 0).sum() == 0


def test_tile_boundary_consistency():
    """Corners near tile boundaries are identical for different tilings."""
    rng = np.random.default_rng(9)
    img = rng.uniform(0, 255, size=(96, 128)).astype(np.float32)
    a = np.asarray(fast_pallas.fast_nms_score(jnp.asarray(img), 20.0, tile_h=24, interpret=True))
    b = np.asarray(fast_pallas.fast_nms_score(jnp.asarray(img), 20.0, tile_h=96, interpret=True))
    np.testing.assert_allclose(a, b, atol=1e-4)
