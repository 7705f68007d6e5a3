"""Filter state pytrees — the TPU-native replacement for the reference's
dynamically-sized state (/root/reference/include/msckf_mono/msckf.h:33-64,
types.h:49-126).

Design (see SURVEY.md §7):

* The camera-state window is ``num_slots`` fixed slots with a validity mask,
  kept chronologically compacted (slot 0 is the oldest valid state). Pruning is
  a permutation + mask update, never a resize.
* The covariance is ONE dense ``(15+6N, 15+6N)`` array. The reference's 3-block
  split (imu/cam/cross, msckf.h:52-54) is a CPU allocation optimization that
  XLA does not need; invalid slots simply carry zero rows/cols.
* Feature tracks are ``max_tracks`` rows whose observations are indexed BY
  WINDOW SLOT: ``obs[m, j]`` is track m's measurement at camera-state slot j.
  This exploits the reference invariant that live observations always refer to
  live camera states (observations are erased whenever their state is pruned,
  msckf.h:482-534/:685-761), so per-track observation count is bounded by the
  window size. Window permutations apply to obs columns unchanged.

All leaves carry an arbitrary leading batch shape; functions in core/ are
written for the unbatched case and lifted with ``vmap``.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from msckf_mono_tpu.utils import quat
from msckf_mono_tpu.utils.config import MsckfConfig


@struct.dataclass
class ImuState:
    """15-DoF IMU state + OC-EKF null-state copies (reference types.h:69-76)."""

    q_IG: jnp.ndarray  # (4,) wxyz, rotates global -> IMU
    b_g: jnp.ndarray   # (3,)
    v_I_G: jnp.ndarray # (3,)
    b_a: jnp.ndarray   # (3,)
    p_I_G: jnp.ndarray # (3,)
    g: jnp.ndarray     # (3,) gravity in global frame (0,0,-9.81)
    q_IG_null: jnp.ndarray
    v_I_G_null: jnp.ndarray
    p_I_G_null: jnp.ndarray


@struct.dataclass
class CamWindow:
    """Sliding window of camera poses (reference types.h:57-67), slot-masked."""

    q_CG: jnp.ndarray      # (N, 4) rotates global -> camera
    p_C_G: jnp.ndarray     # (N, 3) camera position in global
    time: jnp.ndarray      # (N,)
    state_id: jnp.ndarray  # (N,) int32, monotone per augmentation
    valid: jnp.ndarray     # (N,) bool

    @property
    def count(self):
        return jnp.sum(self.valid.astype(jnp.int32), axis=-1)


@struct.dataclass
class TrackTable:
    """Live feature tracks, observations indexed by window slot."""

    obs: jnp.ndarray         # (M, N, 2) undistorted normalized image coords
    obs_mask: jnp.ndarray    # (M, N) bool
    feature_id: jnp.ndarray  # (M,) int32, -1 for empty rows
    active: jnp.ndarray      # (M,) bool
    initialized: jnp.ndarray # (M,) bool (triangulation cached)
    p_f_G: jnp.ndarray       # (M, 3) cached triangulated point

    @property
    def lengths(self):
        return jnp.sum(self.obs_mask.astype(jnp.int32), axis=-1)


@struct.dataclass
class StagedTracks:
    """Dead tracks staged for residualization this frame (compacted rows).

    Mirrors ``featureTrackToResidualize`` (reference types.h:101-114) except
    camera states are referenced through the still-live window rather than
    copied.
    """

    obs: jnp.ndarray         # (S, N, 2)
    obs_mask: jnp.ndarray    # (S, N)
    feature_id: jnp.ndarray  # (S,) int32
    valid: jnp.ndarray       # (S,) bool


@struct.dataclass
class Diagnostics:
    """Monotone counters for silent-cap detection and telemetry."""

    staged_overflow: jnp.ndarray      # tracks dropped because max_staged hit
    row_overflow: jnp.ndarray         # update rows dropped because max_update_rows hit
    track_overflow: jnp.ndarray       # new features dropped because max_tracks hit
    window_overflow: jnp.ndarray      # oldest slot force-dropped because num_slots hit
    gating_rejects: jnp.ndarray
    triangulation_rejects: jnp.ndarray
    motion_rejects: jnp.ndarray
    updates_applied: jnp.ndarray


@struct.dataclass
class FilterState:
    imu: ImuState
    window: CamWindow
    tracks: TrackTable
    P: jnp.ndarray             # (15+6N, 15+6N) error-state covariance
    # Noise parameters as STATE (not static config): under vmap each filter
    # carries its own values, which is what parameter-grid fleets (BASELINE
    # config 5: filters x noise grid) need. init_filter_state seeds them
    # from the config; montecarlo.make_grid_fleet spreads them.
    q_imu_diag: jnp.ndarray    # (12,) continuous-time IMU noise diag (Q_imu)
    meas_sigma2: jnp.ndarray   # () isotropic measurement noise u_var'
    num_residualized: jnp.ndarray  # int32; guards checkMotion (msckf.h:354)
    map_pts: jnp.ndarray       # (S, 3) last frame's triangulated points (msckf.h:50)
    map_mask: jnp.ndarray      # (S,) bool
    # Prune-stage map contributions of THIS frame (the reference also pushes
    # points triangulated inside pruneRedundantStates to map_, msckf.h:531).
    tri_map_pts: jnp.ndarray   # (T_tri, 3)
    tri_map_mask: jnp.ndarray  # (T_tri,)
    # Camera states removed THIS frame (cleared at frame start, appended by
    # both prune stages) — the per-frame feed for the reference's
    # pruned_states_ archive (msckf.h:49, getter :840-848). Host drivers
    # (VioInterface, cli/run_euroc) accumulate these across frames.
    pruned_q: jnp.ndarray      # (N, 4) pose at removal
    pruned_p: jnp.ndarray      # (N, 3)
    pruned_time: jnp.ndarray   # (N,)
    pruned_ids: jnp.ndarray    # (N,) int32
    pruned_mask: jnp.ndarray   # (N,) bool
    diag: Diagnostics


def init_imu_state(
    q_IG=None, b_g=None, v_I_G=None, b_a=None, p_I_G=None, g=None, dtype=jnp.float32
) -> ImuState:
    q_IG = quat.identity(dtype) if q_IG is None else jnp.asarray(q_IG, dtype)
    z3 = jnp.zeros(3, dtype)
    b_g = z3 if b_g is None else jnp.asarray(b_g, dtype)
    v_I_G = z3 if v_I_G is None else jnp.asarray(v_I_G, dtype)
    b_a = z3 if b_a is None else jnp.asarray(b_a, dtype)
    p_I_G = z3 if p_I_G is None else jnp.asarray(p_I_G, dtype)
    g = jnp.asarray([0.0, 0.0, -9.81], dtype) if g is None else jnp.asarray(g, dtype)
    return ImuState(
        q_IG=q_IG, b_g=b_g, v_I_G=v_I_G, b_a=b_a, p_I_G=p_I_G, g=g,
        q_IG_null=q_IG, v_I_G_null=v_I_G, p_I_G_null=p_I_G,
    )


def init_filter_state(config: MsckfConfig, imu: ImuState | None = None, dtype=jnp.float32) -> FilterState:
    """Fresh filter state; covariance seeded like ``MSCKF::initialize``
    (reference msckf.h:72-97)."""
    N = config.shapes.num_slots
    M = config.shapes.max_tracks
    S = config.shapes.max_staged
    D = config.shapes.state_dim

    if imu is None:
        imu = init_imu_state(dtype=dtype)

    window = CamWindow(
        q_CG=jnp.tile(quat.identity(dtype), (N, 1)),
        p_C_G=jnp.zeros((N, 3), dtype),
        time=jnp.zeros((N,), dtype),
        state_id=jnp.full((N,), -1, jnp.int32),
        valid=jnp.zeros((N,), bool),
    )
    tracks = TrackTable(
        obs=jnp.zeros((M, N, 2), dtype),
        obs_mask=jnp.zeros((M, N), bool),
        feature_id=jnp.full((M,), -1, jnp.int32),
        active=jnp.zeros((M,), bool),
        initialized=jnp.zeros((M,), bool),
        p_f_G=jnp.zeros((M, 3), dtype),
    )
    P = jnp.zeros((D, D), dtype)
    P = P.at[jnp.arange(15), jnp.arange(15)].set(
        jnp.asarray(config.initial_imu_covar_diag(), dtype)
    )
    zero = jnp.zeros((), jnp.int32)
    diag = Diagnostics(
        staged_overflow=zero, row_overflow=zero, track_overflow=zero,
        window_overflow=zero,
        gating_rejects=zero, triangulation_rejects=zero, motion_rejects=zero,
        updates_applied=zero,
    )
    T_tri = config.shapes.max_tri_prune
    return FilterState(
        imu=imu, window=window, tracks=tracks, P=P,
        q_imu_diag=jnp.asarray(config.q_imu_diag(), dtype),
        meas_sigma2=jnp.asarray(config.u_var_prime, dtype),
        num_residualized=zero,
        map_pts=jnp.zeros((S, 3), dtype), map_mask=jnp.zeros((S,), bool),
        tri_map_pts=jnp.zeros((T_tri, 3), dtype),
        tri_map_mask=jnp.zeros((T_tri,), bool),
        pruned_q=jnp.zeros((N, 4), dtype),
        pruned_p=jnp.zeros((N, 3), dtype),
        pruned_time=jnp.zeros((N,), dtype),
        pruned_ids=jnp.full((N,), -1, jnp.int32),
        pruned_mask=jnp.zeros((N,), bool),
        diag=diag,
    )
