"""End-to-end: synthetic VIO sequence through the full filter, gated on ATE.

This is the TPU build's replacement for the reference's RViz ground-truth
overlay validation (SURVEY.md §4).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from msckf_mono_tpu.core import filter as msckf_filter
from msckf_mono_tpu.core.init import ground_truth_init
from msckf_mono_tpu.core.types import init_filter_state
from msckf_mono_tpu.data import synthetic
from msckf_mono_tpu.eval.ate import ate_rmse, final_drift
from msckf_mono_tpu.utils.config import MsckfConfig

CFG = MsckfConfig()


def _run(seq, cfg, dtype=jnp.float32):
    imu = ground_truth_init(
        p_I_G=seq.gt_p[0] * 0 + np.array([5.0, 0.0, 0.0]),  # overwritten below
        q_IG=[1, 0, 0, 0],
        v_I_G=[0, 0, 0],
        b_g=seq.b_g,
        b_a=seq.b_a,
        dtype=dtype,
    )
    # proper init from the sequence start (frame inputs begin AFTER first imu block)
    imu = imu.replace(
        p_I_G=jnp.asarray([5.0, 0.0, 0.0], dtype),
        v_I_G=jnp.asarray([0.0, 5.0 * 0.35, 0.2 * 1.4], dtype),
    )
    state = init_filter_state(cfg, imu, dtype=dtype)
    frames = synthetic.to_frame_inputs(seq, dtype)

    run = jax.jit(lambda s, f: msckf_filter.run_sequence(s, f, cfg))
    final, outs = run(state, frames)
    return final, outs


@pytest.mark.slow
def test_synthetic_sequence_ate():
    seq = synthetic.generate(CFG, n_frames=120, seed=0, pixel_noise=0.5)
    final, outs = _run(seq, CFG)

    est = np.asarray(outs.p_I_G)
    gt = seq.gt_p
    assert np.all(np.isfinite(est))

    drift = final_drift(est, gt)
    ate = ate_rmse(est, gt)
    path_len = np.sum(np.linalg.norm(np.diff(gt, axis=0), axis=1))

    # Dead reckoning with biased IMU would blow up; VIO must hold drift under
    # a small fraction of the path length.
    assert drift < 0.05 * path_len, f"drift {drift:.3f} vs path {path_len:.1f}"
    assert ate < 0.5, f"ATE {ate:.3f}"

    # the filter actually used vision
    assert int(final.num_residualized) > 20
    assert int(final.diag.updates_applied) > 20
    # no silent row drops in this nominal config.
    assert int(final.diag.row_overflow) == 0
    # staged_overflow counts (a) prune candidates beyond max_staged_prune
    # (~5 over the sequence: brief spikes to ~53 vs the 48 buffer) and (b)
    # un-initialized candidates beyond the max_tri_prune=16 LM budget —
    # dominated by the ONCE-per-sequence first prune, where ~50 tracks have
    # never been touched by a prune before (steady state: mean 1.4/frame).
    # Those tracks lose their one-last-update only; their obs are erased
    # either way, and ATE is unaffected (asserted above). Bounded so a
    # regression or an unwisely shrunk buffer can't hide.
    assert int(final.diag.staged_overflow) <= 60


@pytest.mark.slow
def test_vision_beats_dead_reckoning():
    # IMU noise + an uncorrected accel-bias init error: dead reckoning drifts
    # quadratically, vision observes and corrects the bias.
    seq = synthetic.generate(
        CFG, n_frames=150, seed=1, pixel_noise=0.5,
        gyro_noise=2e-3, accel_noise=2e-2,
    )
    import dataclasses as _dc

    # measurements were generated with the true bias; the filter (and the DR
    # run) initialize from seq.b_a, so offsetting it here injects the error
    seq = _dc.replace(seq, b_a=seq.b_a + np.array([0.05, -0.03, 0.02]))

    final_vio, outs_vio = _run(seq, CFG)

    # Same sequence with all features invalidated = pure dead reckoning.
    import dataclasses

    seq_blind = dataclasses.replace(
        seq,
        tracked_valid=np.zeros_like(seq.tracked_valid),
        new_valid=np.zeros_like(seq.new_valid),
    )
    final_dr, outs_dr = _run(seq_blind, CFG)

    gt = seq.gt_p
    drift_vio = final_drift(np.asarray(outs_vio.p_I_G), gt)
    drift_dr = final_drift(np.asarray(outs_dr.p_I_G), gt)
    assert drift_vio < drift_dr, f"vio {drift_vio:.3f} vs dr {drift_dr:.3f}"


@pytest.mark.slow
def test_batched_filters_match_single():
    """vmap over identical filters must reproduce the single-filter result."""
    seq = synthetic.generate(CFG, n_frames=40, seed=2, pixel_noise=0.5)
    final_single, outs_single = _run(seq, CFG)

    dtype = jnp.float32
    imu = ground_truth_init(
        p_I_G=[5.0, 0.0, 0.0],
        q_IG=[1, 0, 0, 0],
        v_I_G=[0.0, 5.0 * 0.35, 0.2 * 1.4],
        b_g=seq.b_g,
        b_a=seq.b_a,
        dtype=dtype,
    )
    state = init_filter_state(CFG, imu, dtype=dtype)
    frames = synthetic.to_frame_inputs(seq, dtype)

    B = 3
    batch_state = jax.tree_util.tree_map(lambda x: jnp.stack([x] * B), state)
    batch_frames = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x[:, None, ...], (x.shape[0], B) + x.shape[1:]), frames
    )

    def run_one(s, f):
        return msckf_filter.run_sequence(s, f, CFG)

    run_batch = jax.jit(jax.vmap(run_one, in_axes=(0, 1), out_axes=(0, 1)))
    final_b, outs_b = run_batch(batch_state, batch_frames)

    np.testing.assert_allclose(
        np.asarray(outs_b.p_I_G[:, 0]), np.asarray(outs_single.p_I_G), atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(outs_b.p_I_G[:, 0]), np.asarray(outs_b.p_I_G[:, 1]), atol=1e-6
    )


def test_fused_updates_matches_sequential_closely():
    """fused_updates=True (one stacked marginalize+prune update per frame)
    must track the strict-reference sequential ordering: same ATE regime,
    same number of residualized tracks, no new overflows."""
    import dataclasses

    cfg0 = MsckfConfig()
    cfg1 = dataclasses.replace(
        cfg0, filter=dataclasses.replace(cfg0.filter, fused_updates=True)
    )
    seq = synthetic.generate(cfg0, n_frames=100, seed=3, pixel_noise=0.5)
    imu = ground_truth_init(
        p_I_G=[5.0, 0.0, 0.0], q_IG=[1, 0, 0, 0],
        v_I_G=[0.0, 5.0 * 0.35, 0.28], b_g=seq.b_g, b_a=seq.b_a,
        dtype=jnp.float32,
    )
    frames = synthetic.to_frame_inputs(seq, jnp.float32)

    results = {}
    for name, cfg in (("seq", cfg0), ("fused", cfg1)):
        state = init_filter_state(cfg, imu, dtype=jnp.float32)
        final, outs = jax.jit(lambda s, f, cfg=cfg: msckf_filter.run_sequence(s, f, cfg))(
            state, frames
        )
        results[name] = (final, np.asarray(outs.p_I_G))

    ate_seq = ate_rmse(results["seq"][1], seq.gt_p)
    ate_fused = ate_rmse(results["fused"][1], seq.gt_p)
    # Same accuracy regime (the orderings differ at second order only).
    assert ate_fused < max(2.0 * ate_seq, 0.3), (ate_fused, ate_seq)
    f_seq, f_fused = results["seq"][0], results["fused"][0]
    assert abs(int(f_fused.num_residualized) - int(f_seq.num_residualized)) <= 10
    assert int(f_fused.diag.row_overflow) == 0


def test_anisotropic_r_end_to_end():
    """Full sequence with the exact reference R_o (use_anisotropic_r=True):
    must stay in the same accuracy regime as the isotropic default (the
    sigmas differ <1% at EuRoC intrinsics, so trajectories nearly match)."""
    import dataclasses

    cfg = dataclasses.replace(
        CFG, filter=dataclasses.replace(CFG.filter, use_anisotropic_r=True)
    )
    seq = synthetic.generate(cfg, n_frames=80, seed=4, pixel_noise=0.5)
    final_a, outs_a = _run(seq, cfg)
    final_i, outs_i = _run(seq, CFG)
    est_a, est_i = np.asarray(outs_a.p_I_G), np.asarray(outs_i.p_I_G)
    assert np.all(np.isfinite(est_a))
    ate_a, ate_i = ate_rmse(est_a, seq.gt_p), ate_rmse(est_i, seq.gt_p)
    assert ate_a < max(1.5 * ate_i, 0.3), (ate_a, ate_i)
    # trajectories track each other closely (sub-cm scale differences)
    assert float(np.max(np.linalg.norm(est_a - est_i, axis=1))) < 0.1
