"""Per-frame filter step and device-resident sequence driver.

The reference's main loop (/root/reference/datasets/asl_msckf.cpp:206-478)
drains IMU readings then runs augment -> update -> addFeatures -> marginalize ->
pruneRedundantStates -> pruneEmptyStates per camera frame. Here that whole
frame becomes ONE pure function scanned over pre-staged sensor arrays with
``lax.scan`` — no callbacks, no host round-trips — and batches over filters
with ``vmap`` (see parallel/ for the mesh-sharded version).

The live-node variant (src/ros_interface.cpp:111-116) skips redundant pruning;
that is the ``use_prune_redundant`` config flag.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from msckf_mono_tpu.core import augment, prune, tracks, update
from msckf_mono_tpu.core import propagate as propagate_mod
from msckf_mono_tpu.core.types import FilterState
from msckf_mono_tpu.utils.config import MsckfConfig


@struct.dataclass
class FrameInput:
    """One camera frame plus the IMU samples since the previous frame.

    Leading axes: () for a single frame, (T, ...) when scanned, with an
    additional leading batch axis in batched mode.
    """

    imu_omega: jnp.ndarray   # (K, 3)
    imu_acc: jnp.ndarray     # (K, 3)
    imu_dt: jnp.ndarray      # (K,)   0 for padded samples
    tracked_uv: jnp.ndarray  # (F, 2) undistorted normalized coords
    tracked_ids: jnp.ndarray # (F,)   int32
    tracked_valid: jnp.ndarray  # (F,)
    new_uv: jnp.ndarray      # (F, 2)
    new_ids: jnp.ndarray     # (F,)
    new_valid: jnp.ndarray   # (F,)
    state_id: jnp.ndarray    # () int32
    time: jnp.ndarray        # ()
    frame_valid: jnp.ndarray # () bool


@struct.dataclass
class FrameOutput:
    p_I_G: jnp.ndarray
    q_IG: jnp.ndarray
    v_I_G: jnp.ndarray
    b_g: jnp.ndarray
    b_a: jnp.ndarray
    cam_count: jnp.ndarray
    num_residualized: jnp.ndarray


def propagate_block(state: FilterState, frame: FrameInput, config: MsckfConfig) -> FilterState:
    """The frame's IMU samples as ONE composed covariance update (padded
    samples carry dt=0 == identity); see core/propagate.propagate_block."""
    return propagate_mod.propagate_block(
        state, frame.imu_omega, frame.imu_acc, frame.imu_dt, config
    )


def step(state: FilterState, frame: FrameInput, config: MsckfConfig):
    """One full frame: propagate block + vision update pipeline.

    The whole step runs under HIGHEST matmul precision: on TPU the default
    f32 dot lowers to fast bf16 MXU passes, whose ~8-bit mantissa silently
    destroys the covariance algebra (empirically: the filter diverges within
    ~100 frames). "highest" keeps true f32 accumulation; the image front-end
    is free to use the fast default.
    """
    # Capture the restore point AFTER clearing the per-frame archive buffers:
    # a padded frame must expose EMPTY map/pruned buffers, not re-expose the
    # previous frame's (a host driver accumulating per step would double-count).
    state = prune.clear_frame_archive(state)
    state0 = state

    with jax.default_matmul_precision(config.filter.matmul_precision):
        state = propagate_block(state, frame, config)
        state = augment.augment_state(state, frame.state_id, frame.time, config)
        state, staged = tracks.update_tracks(
            state, frame.tracked_uv, frame.tracked_ids, frame.tracked_valid, config
        )
        state = tracks.add_features(
            state, frame.new_uv, frame.new_ids, frame.new_valid, config
        )
        if config.filter.fused_updates and config.filter.use_prune_redundant:
            state = _fused_vision_update(state, staged, config)
        else:
            state = update.marginalize(state, staged, config)
            if config.filter.use_prune_redundant:
                state = prune.prune_redundant_states(state, config)
        state = prune.prune_empty_states(state, config)

    # Padded frames leave the state untouched.
    state = jax.tree_util.tree_map(
        lambda new, old: jnp.where(
            jnp.reshape(frame.frame_valid, (1,) * new.ndim), new, old
        ),
        state,
        state0,
    )

    out = FrameOutput(
        p_I_G=state.imu.p_I_G,
        q_IG=state.imu.q_IG,
        v_I_G=state.imu.v_I_G,
        b_g=state.imu.b_g,
        b_a=state.imu.b_a,
        cam_count=state.window.count,
        num_residualized=state.num_residualized,
    )
    return state, out


def _fused_vision_update(state: FilterState, staged, config: MsckfConfig) -> FilterState:
    """Marginalize + redundant-prune as ONE stacked EKF update.

    The staged dead tracks (msckf.h:336-449) and the prune candidates'
    one-last-updates (msckf.h:453-682) share the projected-row machinery;
    chaining both sets through one shared row buffer (``carry``) runs one
    gate batch, one row stack and one measurement update per frame instead
    of two of each — and lets each set use its own observation-width cap
    (prune candidates carry ~2 involved obs vs marginalized tracks' ~20,
    tools/measure_row_stats.py). See FilterConfig.fused_updates for the
    (second-order) semantic deviation.
    """
    dtype = state.P.dtype
    sigma2 = state.meas_sigma2.astype(dtype)  # per-filter noise (grid fleets)
    window = state.window
    g = state.imu.g
    shp = config.shapes

    p_f, track_ok, motion_ok, tri_ok = update.marginalize_prep(state, staged, config)
    prep = prune.prune_prep(state, config)

    gate_m, present_m, carry = update.gated_row_stack(
        staged.obs, staged.obs_mask, p_f, track_ok, window, g, state.P,
        sigma2, config, m_cap=shp.marg_obs_cap or None, return_carry=True,
    )
    out = update.gated_row_stack(
        prep["c_obs"], prep["c_mask_inv"], prep["p_use"], prep["use_track"],
        window, g, state.P, sigma2, config,
        m_cap=shp.prune_obs_cap or None, carry=carry,
        chunk=shp.prune_chunk or None,
    )
    H, r, gate_p, present_p, n_dropped = out[:5]
    V, tids = (out[5], out[6]) if config.filter.use_anisotropic_r else (None, None)
    state = update.measurement_update(state, H, r, sigma2, config, V=V, v_track_ids=tids)

    state = update.marginalize_post(
        state, staged, p_f, track_ok, motion_ok, tri_ok,
        gate_m, present_m, n_dropped, config,
    )
    # row_overflow already counted once in marginalize_post.
    zero = n_dropped * 0
    return prune.prune_post(state, prep, gate_p, zero, config)


def run_sequence(state: FilterState, frames: FrameInput, config: MsckfConfig):
    """Scan `step` over a (T, ...) stack of FrameInputs."""

    def body(s, f):
        return step(s, f, config)

    return jax.lax.scan(body, state, frames)


def _stage_pass(state: FilterState, config: MsckfConfig):
    """Stage up to ``max_staged`` eligible tracks and clear them from the table."""
    from msckf_mono_tpu.core.types import StagedTracks

    shp = config.shapes
    t = state.tracks
    eligible = t.active & (t.lengths >= config.filter.min_track_length)

    order = jnp.argsort(jnp.logical_not(eligible), stable=True)[: shp.max_staged]
    staged_valid = eligible[order]
    staged = StagedTracks(
        obs=t.obs[order],
        obs_mask=t.obs_mask[order] & staged_valid[:, None],
        feature_id=t.feature_id[order],
        valid=staged_valid,
    )
    taken = jnp.zeros_like(eligible).at[order].set(staged_valid)
    cleared = t.replace(
        active=t.active & ~taken,
        feature_id=jnp.where(taken, -1, t.feature_id),
        obs_mask=t.obs_mask & ~taken[:, None],
    )
    remaining = jnp.sum(eligible) - jnp.sum(staged_valid)
    return state.replace(tracks=cleared), staged, remaining


def finish(state: FilterState, config: MsckfConfig, collect_map: bool = False):
    """End-of-sequence: residualize EVERY remaining eligible track
    (msckf.h:765-807 force-residualizes all of them).

    The per-update staging buffer holds ``max_staged`` tracks, so this loops
    ⌈max_tracks/max_staged⌉ passes; passes with nothing staged are identity
    updates (all rows masked), so running the fixed worst-case count is safe.

    The steady-state row budget (``max_update_rows``) is sized for the ~1
    track/frame steady state; finish() force-residualizes up to ``max_staged``
    long tracks per pass, so it runs with the budget raised to the worst case
    (a separately-jitted program — config is static, state shapes unchanged).

    With ``collect_map`` returns (state, pts (n_passes·S, 3), mask) — every
    point triangulated by the final passes, for the cumulative map surface
    (the reference's finish marginalizes push to ``map_`` too, msckf.h:372).
    """
    import dataclasses

    shp = config.shapes
    n_passes = -(-shp.max_tracks // shp.max_staged)
    worst_rows = shp.max_staged * (2 * shp.num_slots - 3)
    config = dataclasses.replace(
        config, shapes=dataclasses.replace(shp, max_update_rows=worst_rows)
    )

    pts, masks = [], []
    with jax.default_matmul_precision(config.filter.matmul_precision):
        for _ in range(n_passes):
            state, staged, _ = _stage_pass(state, config)
            state = update.marginalize(state, staged, config)
            if collect_map:
                pts.append(state.map_pts)
                masks.append(state.map_mask)
    if collect_map:
        return state, jnp.concatenate(pts), jnp.concatenate(masks)
    return state
