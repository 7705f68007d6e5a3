"""Pure-function front-end: one pytree state + one jittable step per frame.

The scannable/batchable core of the TrackHandler
(/root/reference/src/corner_detector.cpp:196-439, re-designed in
frontend/track_handler.py as a host-stateful class). Making the per-frame
front-end a pure function over a ``FrontendState`` pytree unlocks the
TPU-native composition the reference architecture cannot express:

* the full pixels->features->filter frame runs as ONE compiled program
  (core/pipeline.py), scanned over a sequence with ``lax.scan``;
* a batch axis over *independent image streams* via ``vmap`` — the
  image-domain scale-out (BASELINE.md config 4);
* the previous frame's pyramid lives in the state, so each image is
  pyramid-decomposed exactly once.

Feature ids are assigned on device with the reference's monotone scheme
(next_feature_id incremented once per frame, then once per new feature,
corner_detector.cpp:407-411).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from flax import struct

from msckf_mono_tpu.frontend import detect, klt, undistort
from msckf_mono_tpu.utils.config import MsckfConfig


@struct.dataclass
class FrontendConfig:
    """Static front-end parameters (hashable; close over jit)."""

    n_grid_rows: int = 10
    n_grid_cols: int = 10
    max_features: int = 128
    window_size: int = 31
    max_level: int = 4
    max_iters: int = 30
    fast_threshold: float = 20.0
    detection_threshold: float = 40.0
    max_flow_px: float = 25.0
    # matmul tier for the image-domain ops (pyramid build, Shi-Tomasi):
    # "highest" = exact f32 (the parity default), "default" = 1-pass bf16
    # (the serving tier; the image bench's ATE carries the measured cost —
    # same pattern as FilterConfig.matmul_precision / MIXED_PRECISION.md)
    image_precision: str = "highest"

    def __hash__(self):
        return hash(
            (self.n_grid_rows, self.n_grid_cols, self.max_features,
             self.window_size, self.max_level, self.max_iters,
             self.fast_threshold, self.detection_threshold, self.max_flow_px,
             self.image_precision)
        )


@struct.dataclass
class FrontendState:
    pyramid: tuple          # prev image pyramid, tuple of (H/2^l, W/2^l)
    pts: jnp.ndarray        # (F, 2) pixel coords in prev image
    ids: jnp.ndarray        # (F,) int32
    valid: jnp.ndarray      # (F,) bool
    next_id: jnp.ndarray    # () int32
    has_prev: jnp.ndarray   # () bool


@struct.dataclass
class FrontendOutput:
    """Per-frame feature lists, shaped exactly like core.filter.FrameInput's
    vision fields (undistorted normalized coordinates)."""

    tracked_uv: jnp.ndarray
    tracked_ids: jnp.ndarray
    tracked_valid: jnp.ndarray
    new_uv: jnp.ndarray
    new_ids: jnp.ndarray
    new_valid: jnp.ndarray


def init_frontend_state(height: int, width: int, fcfg: FrontendConfig, dtype=jnp.float32) -> FrontendState:
    F = fcfg.max_features
    pyr = klt.build_pyramid(jnp.zeros((height, width), dtype), fcfg.max_level)
    return FrontendState(
        pyramid=pyr,
        pts=jnp.zeros((F, 2), dtype),
        ids=jnp.full((F,), -1, jnp.int32),
        valid=jnp.zeros((F,), bool),
        next_id=jnp.zeros((), jnp.int32),
        has_prev=jnp.zeros((), bool),
    )


def _camera_arrays(config: MsckfConfig, dtype):
    cam = config.camera
    K = jnp.asarray(
        [[cam.f_u, 0.0, cam.c_u], [0.0, cam.f_v, cam.c_v], [0.0, 0.0, 1.0]], dtype
    )
    K_inv = jnp.asarray(
        [
            [1.0 / cam.f_u, 0.0, -cam.c_u / cam.f_u],
            [0.0, 1.0 / cam.f_v, -cam.c_v / cam.f_v],
            [0.0, 0.0, 1.0],
        ],
        dtype,
    )
    return K, K_inv


def frontend_step(
    state: FrontendState,
    img: jnp.ndarray,
    dR: jnp.ndarray,
    config: MsckfConfig,
    fcfg: FrontendConfig,
) -> tuple[FrontendState, FrontendOutput]:
    """One frame: predict -> KLT -> reject -> detect new -> dedup carry.

    ``dR`` is the camera-frame rotation over the inter-frame interval (the
    gyro integral, corner_detector.cpp:220-276); pass identity if unknown.
    """
    cam = config.camera
    dtype = state.pts.dtype
    F = fcfg.max_features
    H, W = img.shape
    K, K_inv = _camera_arrays(config, dtype)

    cur_pyr = klt.build_pyramid(img.astype(dtype), fcfg.max_level,
                                precision=fcfg.image_precision)

    # ---- track (corner_detector.cpp:320-394) ----
    Hm = K @ dR.astype(dtype) @ K_inv
    ph = jnp.concatenate([state.pts, jnp.ones((F, 1), dtype)], axis=-1) @ Hm.T
    denom = jnp.where(jnp.abs(ph[:, 2:3]) < 1e-12, 1e-12, ph[:, 2:3])
    pred = ph[:, :2] / denom

    track_valid = state.valid & state.has_prev
    pts, status = klt.track_features_pyr(
        state.pyramid, cur_pyr, state.pts, pred, track_valid,
        window_size=fcfg.window_size, max_iters=fcfg.max_iters,
    )
    status = klt.reject_outliers(
        state.pts, pts, status, (H, W), max_flow=fcfg.max_flow_px
    )

    tracked_uv = undistort.undistort_points(
        pts, K, cam.distortion_coeffs, cam.distortion_model
    )
    tracked_ids = jnp.where(status, state.ids, -1)

    # ---- detect new corners in unoccupied cells (cd.cpp:396-429) ----
    n_cells = fcfg.n_grid_rows * fcfg.n_grid_cols
    gh, gw = H // fcfg.n_grid_rows + 1, W // fcfg.n_grid_cols + 1
    cell = (pts[:, 1] // gh).astype(jnp.int32) * fcfg.n_grid_cols + (
        pts[:, 0] // gw
    ).astype(jnp.int32)
    cell = jnp.clip(cell, 0, n_cells - 1)
    occupied = jnp.zeros((n_cells,), bool).at[
        jnp.where(status, cell, n_cells)
    ].set(True, mode="drop")

    xy, _score, det_valid = detect.detect_features(
        img.astype(dtype), occupied,
        fcfg.n_grid_rows, fcfg.n_grid_cols,
        fcfg.fast_threshold, fcfg.detection_threshold,
        st_precision=fcfg.image_precision,
    )
    order = jnp.argsort(jnp.logical_not(det_valid), stable=True)[:F]
    new_xy = jnp.where(det_valid[order, None], xy[order], 0.0).astype(dtype)
    new_valid = det_valid[order]
    # monotone ids: +1 once per frame, then sequential (cd.cpp:407-411)
    seq = jnp.cumsum(new_valid.astype(jnp.int32)) - 1
    new_ids = jnp.where(new_valid, state.next_id + 1 + seq, -1)
    next_id = (state.next_id + 1 + jnp.sum(new_valid.astype(jnp.int32))).astype(jnp.int32)
    new_uv = undistort.undistort_points(
        new_xy, K, cam.distortion_coeffs, cam.distortion_model
    )

    out = FrontendOutput(
        tracked_uv=jnp.where(status[:, None], tracked_uv, 0.0).astype(dtype),
        tracked_ids=tracked_ids.astype(jnp.int32),
        tracked_valid=status,
        new_uv=jnp.where(new_valid[:, None], new_uv, 0.0).astype(dtype),
        new_ids=new_ids.astype(jnp.int32),
        new_valid=new_valid,
    )

    # ---- carry for the next frame: tracked + new, one per cell (cd.cpp:292-308) ----
    all_pts = jnp.concatenate([pts, new_xy])
    all_ids = jnp.concatenate([tracked_ids, new_ids])
    all_valid = jnp.concatenate([status, new_valid])
    cpts, cids, cvalid = _grid_dedup(
        all_pts, all_ids, all_valid, H, W,
        fcfg.n_grid_rows, fcfg.n_grid_cols, F,
    )

    new_state = FrontendState(
        pyramid=cur_pyr,
        pts=cpts,
        ids=cids,
        valid=cvalid,
        next_id=next_id,
        has_prev=jnp.ones((), bool),
    )
    return new_state, out


def _grid_dedup(pts, ids, valid, H, W, n_rows, n_cols, out_n):
    gh, gw = H // n_rows + 1, W // n_cols + 1
    n_cells = n_rows * n_cols
    cell = (pts[:, 1] // gh).astype(jnp.int32) * n_cols + (pts[:, 0] // gw).astype(jnp.int32)
    cell = jnp.clip(cell, 0, n_cells - 1)
    order_idx = jnp.arange(pts.shape[0])
    first = jax.ops.segment_min(
        jnp.where(valid, order_idx, pts.shape[0]), cell, num_segments=n_cells
    )
    keep = valid & (first[cell] == order_idx)
    order = jnp.argsort(jnp.logical_not(keep), stable=True)[:out_n]
    kept = keep[order]
    return (
        jnp.where(kept[:, None], pts[order], 0.0),
        jnp.where(kept, ids[order], -1),
        kept,
    )


def make_jitted_step(config: MsckfConfig, fcfg: FrontendConfig):
    @jax.jit
    def step(state, img, dR):
        return frontend_step(state, img, dR, config, fcfg)

    return step
