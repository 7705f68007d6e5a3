"""Fused device pipeline: pixels -> features -> filter in one program.

The reference's per-frame host loop (/root/reference/src/ros_interface.cpp:
48-120: drain IMU -> propagate -> KLT -> detect -> augment -> update ->
marginalize -> prune) becomes ONE pure function over a (FilterState,
FrontendState) carry, scanned over pre-staged image + IMU stacks with
``lax.scan`` and lifted over a batch of independent streams with ``vmap``
(BASELINE.md config 4: front-end in the loop). No host round-trips anywhere
inside a sequence.

The gyro-warp prediction uses the filter's *current* gyro-bias estimate,
like the live node feeding ``imu.omega - b_g`` through the IMU-camera
rotation (ros_interface.cpp:95-99, corner_detector.cpp:215-276).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from msckf_mono_tpu.core import filter as msckf_filter
from msckf_mono_tpu.core.filter import FrameInput
from msckf_mono_tpu.frontend import functional
from msckf_mono_tpu.frontend.functional import FrontendConfig, FrontendState
from msckf_mono_tpu.utils import quat
from msckf_mono_tpu.utils.config import MsckfConfig


@struct.dataclass
class ImageFrameInput:
    """One camera image + the IMU block since the previous frame."""

    image: jnp.ndarray      # (H, W)
    imu_omega: jnp.ndarray  # (K, 3)
    imu_acc: jnp.ndarray    # (K, 3)
    imu_dt: jnp.ndarray     # (K,)
    state_id: jnp.ndarray   # () int32
    time: jnp.ndarray       # ()
    frame_valid: jnp.ndarray  # () bool


def _gyro_dR(frame: ImageFrameInput, b_g, q_CI, dtype):
    """Camera-frame rotation over the frame interval from the gyro mean."""
    w = (frame.imu_dt > 0).astype(dtype)
    n = jnp.maximum(jnp.sum(w), 1.0)
    omega_imu = jnp.sum((frame.imu_omega - b_g[None, :]) * w[:, None], axis=0) / n
    omega_cam = quat.rotate(q_CI, omega_imu)
    dt_total = jnp.sum(frame.imu_dt)
    rvec = -omega_cam * dt_total
    angle = jnp.linalg.norm(rvec)
    axis = rvec / jnp.where(angle < 1e-12, 1.0, angle)
    q = jnp.concatenate([jnp.cos(angle / 2)[None], jnp.sin(angle / 2) * axis])
    q = jnp.where(angle < 1e-12, jnp.asarray([1.0, 0, 0, 0], dtype), q)
    return quat.to_rotmat(q.astype(dtype))


def _budget(uv, ids, valid, F):
    order = jnp.argsort(jnp.logical_not(valid), stable=True)[:F]
    return uv[order], ids[order], valid[order]


def step(
    carry: tuple,
    frame: ImageFrameInput,
    config: MsckfConfig,
    fcfg: FrontendConfig,
):
    """(filter_state, frontend_state) x image-frame -> new carry + FrameOutput."""
    state, fstate = carry
    dtype = state.P.dtype
    q_CI = jnp.asarray(config.camera.q_CI, dtype)

    dR = _gyro_dR(frame, state.imu.b_g, q_CI, dtype)
    fstate, feats = functional.frontend_step(
        fstate, frame.image.astype(dtype), dR, config, fcfg
    )

    F = config.shapes.max_features_per_frame
    t_uv, t_ids, t_valid = _budget(feats.tracked_uv, feats.tracked_ids, feats.tracked_valid, F)
    n_uv, n_ids, n_valid = _budget(feats.new_uv, feats.new_ids, feats.new_valid, F)

    fin = FrameInput(
        imu_omega=frame.imu_omega.astype(dtype),
        imu_acc=frame.imu_acc.astype(dtype),
        imu_dt=frame.imu_dt.astype(dtype),
        tracked_uv=t_uv.astype(dtype),
        tracked_ids=t_ids,
        tracked_valid=t_valid,
        new_uv=n_uv.astype(dtype),
        new_ids=n_ids,
        new_valid=n_valid,
        state_id=frame.state_id,
        time=frame.time.astype(dtype),
        frame_valid=frame.frame_valid,
    )
    state, out = msckf_filter.step(state, fin, config)
    return (state, fstate), out


def run_images(
    state,
    fstate: FrontendState,
    frames: ImageFrameInput,
    config: MsckfConfig,
    fcfg: FrontendConfig,
):
    """Scan the fused step over a (T, ...) stack of image frames."""

    def body(carry, f):
        return step(carry, f, config, fcfg)

    (state, fstate), outs = jax.lax.scan(body, (state, fstate), frames)
    return state, fstate, outs


def batched_run_images(config: MsckfConfig, fcfg: FrontendConfig):
    """vmap of run_images over a leading batch of independent image streams:
    states (B, ...), fstates (B, ...), frames (T, B, ...)."""

    def run(states, fstates, frames):
        return jax.vmap(
            lambda s, fs, f: run_images(s, fs, f, config, fcfg),
            in_axes=(0, 0, 1),
            out_axes=(0, 0, 1),
        )(states, fstates, frames)

    return run


def batched_run_images_shared(config: MsckfConfig, fcfg: FrontendConfig):
    """Monte-Carlo variant: B filters sharing ONE camera stream.

    ``frames.image`` is (T, H, W) and vmapped with ``in_axes=None`` — XLA
    then hoists every image-only computation (pyramid build, FAST+NMS
    scoring) out of the batch, computing it once per frame; only the
    track-dependent work (KLT, grid selection, the filter) stays batched.
    This is the fleet configuration (BASELINE configs 2/3/5: perturbed inits
    on the same sequence) with the front-end genuinely in the loop.

    NOTE: the per-filter front-end STATE (tracks/ids) still diverges across
    the batch (each filter's gyro-bias estimate warps predictions
    differently), so results are not identical across filters.
    """
    frame_axes = ImageFrameInput(
        image=None, imu_omega=1, imu_acc=1, imu_dt=1,
        state_id=1, time=1, frame_valid=1,
    )

    def run(states, fstates, frames):
        return jax.vmap(
            lambda s, fs, f: run_images(s, fs, f, config, fcfg),
            in_axes=(0, 0, frame_axes),
            out_axes=(0, 0, 1),
        )(states, fstates, frames)

    return run
