"""Mixed-precision configs (BASELINE config 3; reference README.md:47 — the
core is "fully templated on the floating point type").

Precision tiers on TPU MXU:
  - "highest": true f32 accumulation (6 bf16 passes) — the parity default;
  - "high":    3 bf16 passes (~tf32 quality) — the mixed f32/bf16 config;
  - "default": 1 bf16 pass — documented to destroy the covariance algebra.

These tests pin the accuracy contract of the mixed config on the synthetic
golden world: "high" must track "highest" closely; they run on CPU (where
precision flags are no-ops numerically) only as a smoke gate, so the real
assertion is shape/flow plus the f64-vs-f32 scalar-templating check.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from msckf_mono_tpu.core import filter as mf
from msckf_mono_tpu.core.init import ground_truth_init
from msckf_mono_tpu.core.types import init_filter_state
from msckf_mono_tpu.data import synthetic
from msckf_mono_tpu.eval.ate import ate_rmse
from msckf_mono_tpu.utils.config import MsckfConfig


def _run(cfg, dtype, n_frames=60):
    seq = synthetic.generate(cfg, n_frames=n_frames, seed=0, pixel_noise=0.5)
    imu = ground_truth_init(
        p_I_G=[5.0, 0.0, 0.0], q_IG=[1, 0, 0, 0],
        v_I_G=[0.0, 5.0 * 0.35, 0.28], b_g=seq.b_g, b_a=seq.b_a, dtype=dtype,
    )
    state = init_filter_state(cfg, imu, dtype=dtype)
    frames = synthetic.to_frame_inputs(seq, dtype)
    final, outs = jax.jit(lambda s, f: mf.run_sequence(s, f, cfg))(state, frames)
    return np.asarray(outs.p_I_G), seq.gt_p, final


@pytest.mark.parametrize("precision", ["highest", "high"])
def test_precision_configs_run_and_converge(precision):
    import dataclasses

    cfg = MsckfConfig().replace(
        filter=dataclasses.replace(MsckfConfig().filter, matmul_precision=precision)
    )
    est, gt, final = _run(cfg, jnp.float32)
    assert np.all(np.isfinite(est))
    ate = ate_rmse(est, gt)
    assert ate < 0.5, (precision, ate)
    assert int(final.diag.updates_applied) > 20


def test_scalar_templating_f64_vs_f32():
    """The f64 path (the reference's <double> instantiation) agrees with f32
    to f32-roundoff scale — both run the identical program."""
    cfg = MsckfConfig()
    est32, gt, _ = _run(cfg, jnp.float32, n_frames=40)
    est64, _, _ = _run(cfg, jnp.float64, n_frames=40)
    assert np.all(np.isfinite(est64))
    # f32 vs f64 trajectories diverge only through accumulated roundoff
    assert np.max(np.abs(est32 - est64)) < 5e-2
