"""Golden-trajectory regression harness.

The reference has no numerical tests; its closest artifact is the GT-seeded
deterministic run used for visual comparison (SURVEY.md §4,
/root/reference/datasets/asl_msckf.cpp:151-159). This module pins our own
numerics instead: a deterministic f64 synthetic sequence is run through the
full filter and the resulting trajectory is stored as a golden .npz; the
regression test replays it and demands agreement to near machine precision.
Any change to the estimator math that moves the trajectory — intended or not
— must regenerate the golden (python -m msckf_mono_tpu.eval.golden --write).
"""

from __future__ import annotations

import argparse
import os

import numpy as np

GOLDEN_SPEC = dict(n_frames=100, seed=12345, pixel_noise=0.5)
DEFAULT_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "tests", "golden", "synthetic_f64.npz",
)


def run_golden_sequence():
    """The pinned configuration: f64, default MsckfConfig, fixed seed."""
    import jax

    # the golden is defined as the f64 CPU run (f64 linalg is CPU-only on TPU
    # backends, and the env-var platform override is unreliable in some images)
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from msckf_mono_tpu.core import filter as msckf_filter
    from msckf_mono_tpu.core.init import ground_truth_init
    from msckf_mono_tpu.core.types import init_filter_state
    from msckf_mono_tpu.data import synthetic
    from msckf_mono_tpu.utils.config import MsckfConfig

    cfg = MsckfConfig()
    seq = synthetic.generate(cfg, **GOLDEN_SPEC)
    imu = ground_truth_init(
        p_I_G=[5.0, 0.0, 0.0], q_IG=[1, 0, 0, 0],
        v_I_G=[0.0, 5.0 * 0.35, 0.2 * 1.4],
        b_g=seq.b_g, b_a=seq.b_a, dtype=jnp.float64,
    )
    state = init_filter_state(cfg, imu, dtype=jnp.float64)
    frames = synthetic.to_frame_inputs(seq, jnp.float64)
    final, outs = jax.jit(lambda s, f: msckf_filter.run_sequence(s, f, cfg))(
        state, frames
    )
    return {
        "p": np.asarray(outs.p_I_G),
        "q": np.asarray(outs.q_IG),
        "v": np.asarray(outs.v_I_G),
        "P_trace": np.asarray(np.trace(np.asarray(final.P))),
        "num_residualized": np.asarray(final.num_residualized),
        "gt_p": seq.gt_p,
    }


def write_golden(path: str = DEFAULT_PATH) -> str:
    res = run_golden_sequence()
    os.makedirs(os.path.dirname(path), exist_ok=True)
    np.savez_compressed(path, **res)
    return path


def compare_to_golden(path: str = DEFAULT_PATH, rtol=1e-9, atol=1e-9) -> dict:
    """Re-run and diff. Returns max abs errors; raises AssertionError on drift."""
    golden = np.load(path)
    res = run_golden_sequence()
    errs = {}
    for key in ("p", "q", "v"):
        errs[key] = float(np.abs(res[key] - golden[key]).max())
        np.testing.assert_allclose(res[key], golden[key], rtol=rtol, atol=atol, err_msg=key)
    np.testing.assert_allclose(res["P_trace"], golden["P_trace"], rtol=1e-6)
    assert int(res["num_residualized"]) == int(golden["num_residualized"])
    return errs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--write", action="store_true")
    ap.add_argument("--path", default=DEFAULT_PATH)
    args = ap.parse_args()
    if args.write:
        print("wrote", write_golden(args.path))
    else:
        print("ok", compare_to_golden(args.path))


if __name__ == "__main__":
    main()
