"""Golden-trajectory numerical regression (eval/golden.py).

Pins the estimator's f64 output bit-for-bit-ish against a committed golden;
regenerate with `python -m msckf_mono_tpu.eval.golden --write` after any
intended numerics change."""

import os

import pytest

from msckf_mono_tpu.eval import golden


@pytest.mark.slow
def test_matches_committed_golden():
    assert os.path.exists(golden.DEFAULT_PATH), (
        "golden missing — run: python -m msckf_mono_tpu.eval.golden --write"
    )
    errs = golden.compare_to_golden(golden.DEFAULT_PATH)
    # report the drift magnitudes on success for the log
    print("golden max-abs drift:", errs)
