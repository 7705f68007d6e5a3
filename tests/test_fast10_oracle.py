"""FAST-10 exact-oracle regression (VERDICT r4 missing #2).

The oracle (tools/fast10_oracle.py) implements the published FAST-10
definition with a formulation deliberately different from production:
boolean segment test via circular run-length scan + libfast-style integer
binary-search score, vs production's closed-form max-over-arcs-of-arc-min
(frontend/detect.py). Exact set/score agreement on integer images is
asserted here on small inputs; the committed FAST10_ORACLE.json carries the
full-resolution rendered-world runs (1864-15458 corners, all exact).
"""

import numpy as np
import pytest

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from fast10_oracle import THRESHOLD, nonmax_3x3, oracle_score, segment_test  # noqa: E402


@pytest.fixture(scope="module")
def images():
    rng = np.random.default_rng(3)
    rand = rng.integers(0, 256, (96, 128)).astype(np.int64)
    blocks = np.kron(rng.integers(0, 256, (12, 16)), np.ones((8, 8), np.int64))
    # a synthetic corner pattern: bright dots on flat background
    dots = np.full((96, 128), 40, np.int64)
    for y, x in [(20, 30), (50, 80), (70, 100), (25, 90)]:
        dots[y - 1 : y + 2, x - 1 : x + 2] = 220
    return {"random": rand, "blocks": blocks, "dots": dots}


def test_detect_sets_exact(images):
    import jax.numpy as jnp
    from msckf_mono_tpu.frontend import detect

    for name, img in images.items():
        corner = segment_test(img, THRESHOLD)
        mask, _ = detect.fast_score_10(jnp.asarray(img, jnp.float64),
                                       float(THRESHOLD))
        assert (np.asarray(mask) == corner).all(), name


def test_scores_exact_vs_binary_search(images):
    """libfast score semantics == our closed-form score - 1 on int images."""
    import jax.numpy as jnp
    from msckf_mono_tpu.frontend import detect

    for name, img in images.items():
        corner, score = oracle_score(img)
        _, ours = detect.fast_score_10(jnp.asarray(img, jnp.float64),
                                       float(THRESHOLD))
        ours = np.asarray(ours)
        if corner.any():
            assert np.array_equal(score[corner],
                                  (ours[corner] - 1).astype(np.int64)), name


def test_nms_sets_match(images):
    import jax.numpy as jnp
    from msckf_mono_tpu.frontend import detect

    for name, img in images.items():
        corner, score = oracle_score(img)
        keep, _ = nonmax_3x3(score, corner, tie="keep")
        mask, fscore = detect.fast_score_10(jnp.asarray(img, jnp.float64),
                                            float(THRESHOLD))
        nms = np.asarray(detect.nonmax_3x3(fscore, mask))
        assert (nms == keep).all(), name


def test_pallas_kernel_matches_oracle(images):
    """The TPU kernel (interpret mode on CPU) against the oracle NMS sets."""
    import jax.numpy as jnp
    from msckf_mono_tpu.ops import fast_pallas

    img = images["dots"]
    corner, score = oracle_score(img)
    keep, _ = nonmax_3x3(score, corner, tie="keep")
    nms = np.asarray(fast_pallas.fast_nms_score(
        jnp.asarray(img, jnp.float32), float(THRESHOLD), interpret=True)) > 0
    assert (nms == keep).all()
