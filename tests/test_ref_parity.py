"""Numerical parity against the COMPILED reference MSCKF (VERDICT r3 item 2).

tools/ref_harness compiles /root/reference/include/msckf_mono/msckf.h
unmodified (Eigen from the tensorflow wheel, a scipy-generated chi-squared
stub) and runs the exact asl_msckf per-frame pipeline on dumped synthetic
inputs. This test diffs our f64 core against it per frame and per stage.

Expected regimes (measured, see REF_PARITY.json):
* pre-prune (frames < 20): state/covariance match to ~1e-12 — propagate,
  augment, track bookkeeping, marginalize (incl. anisotropic R_o + QR
  compression) are numerically the same computation;
* prune frames: the redundant-state selection matches exactly; the state
  inherits ~1e-5-level differences from LM triangulation of long tracks
  (both sides stop at the reference's 5e-7 delta tolerance on different
  iterates — amplified by ~1/rho^2 to feature position, linearly into the
  update residual), while P stays at ~1e-6 relative.
"""

import os
import shutil
import subprocess

import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
HARNESS = os.path.join(os.path.dirname(HERE), "tools", "ref_harness")


def _harness_available():
    if not shutil.which("g++"):
        return False
    if not os.path.isdir("/root/reference/include/msckf_mono"):
        return False
    try:
        import tensorflow  # noqa: F401
    except Exception:
        tf_inc = "/opt/venv/lib/python3.12/site-packages/tensorflow/include"
        if not os.path.isdir(tf_inc):
            return False
    return True


@pytest.mark.skipif(not _harness_available(),
                    reason="g++/reference/Eigen headers unavailable")
def test_compiled_reference_parity():
    exe = os.path.join(HARNESS, "ref_harness")
    if not os.path.exists(exe):
        subprocess.run([os.path.join(HARNESS, "build.sh")], check=True,
                       timeout=600)

    from tools.ref_harness.run_parity import run_parity

    summary, rows = run_parity(frames=24, noise=0.5)

    assert summary["all_windows_matched"], summary
    assert summary["all_rm_selections_matched"], summary

    state_rows = [r for r in rows if r.get("stage") in (0, 1, 2)]
    pre_prune = [r for r in state_rows if r["frame"] < 20]
    assert pre_prune, "expected pre-prune frames"
    assert max(r["dp"] for r in pre_prune) < 1e-9
    assert max(r["dq"] for r in pre_prune) < 1e-9
    assert max(r["dP_rel"] for r in pre_prune) < 1e-8

    # across the first prune cycles: LM-tolerance-limited but tightly bounded
    assert summary["max_dp"] < 1e-4
    assert summary["max_dq"] < 1e-5
    assert summary["max_dP_rel"] < 1e-4
