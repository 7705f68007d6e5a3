"""Per-frame front-end orchestration.

Re-design of ``TrackHandler`` (/root/reference/src/corner_detector.cpp:196-439)
with fixed-size feature slots and jitted device kernels. The per-frame contract
matches the reference exactly: after ``set_current_image``, ``tracked_features``
returns the KLT-surviving features (undistorted, normalized) with their ids and
``new_features`` returns freshly detected corners with fresh monotone ids.

Pipeline per frame (corner_detector.cpp:320-429):
  gyro accumulation -> mean rotation over the inter-frame interval (Rodrigues,
  corner_detector.cpp:220-244) -> rotation-only homography prediction
  H = K·dR·K⁻¹ (:246-276) -> pyramidal KLT with initial flow -> outlier
  rejection (|flow|>25px, out-of-image) -> per-cell dedup (:292-308)
  -> optional two-point RANSAC (reference ships it disabled, :366)
  -> undistort -> grid-occupancy-masked FAST detection for new features.

Host holds only scalar bookkeeping (time, id counter); all array state lives
in fixed-shape jnp arrays so each stage is one compiled call.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from msckf_mono_tpu.frontend import detect, klt, ransac, undistort
from msckf_mono_tpu.utils import quat


class TrackHandler:
    def __init__(
        self,
        K: np.ndarray,
        dist_coeffs,
        dist_model: str = "radtan",
        n_grid_rows: int = 10,
        n_grid_cols: int = 10,
        max_features: int = 200,
        window_size: int = 31,
        max_level: int = 4,
        ransac_threshold: float = 2e-7,
        use_ransac: bool = False,   # the reference ships it disabled (&& false)
        fast_threshold: float = 20.0,
        detection_threshold: float = 40.0,
        dtype=jnp.float32,
    ):
        self.K = jnp.asarray(K, dtype)
        self.K_inv = jnp.asarray(np.linalg.inv(np.asarray(K, np.float64)), dtype)
        self.dist_coeffs = tuple(float(c) for c in np.asarray(dist_coeffs).ravel())
        self.dist_model = dist_model
        self.n_rows = n_grid_rows
        self.n_cols = n_grid_cols
        self.F = max_features
        self.window_size = window_size
        self.max_level = max_level
        self.ransac_threshold = ransac_threshold
        self.use_ransac = use_ransac
        self.fast_threshold = fast_threshold
        self.detection_threshold = detection_threshold
        self.dtype = dtype

        self.prev_img = None
        self.cur_img = None
        self.prev_time = 0.0
        self.cur_time = 0.0
        self.next_feature_id = 0
        self._key = jax.random.PRNGKey(0)

        F = self.F
        self.prev_pts = jnp.zeros((F, 2), dtype)
        self.prev_ids = jnp.full((F,), -1, jnp.int32)
        self.prev_valid = jnp.zeros((F,), bool)
        self.cur_pts = jnp.zeros((F, 2), dtype)
        self.cur_ids = jnp.full((F,), -1, jnp.int32)
        self.cur_valid = jnp.zeros((F,), bool)
        self.new_pts = jnp.zeros((F, 2), dtype)
        self.new_ids = jnp.full((F,), -1, jnp.int32)
        self.new_valid = jnp.zeros((F,), bool)

        self.gyro_accum = np.zeros(3)
        self.n_gyro = 0
        self.dR = jnp.eye(3, dtype=dtype)

    # ---- gyro warp (corner_detector.cpp:215-276) ----

    def add_gyro_reading(self, gyro):
        self.gyro_accum += np.asarray(gyro, float)
        self.n_gyro += 1

    def _integrate_gyro(self):
        dt = self.cur_time - self.prev_time
        if self.n_gyro == 0:
            self.dR = jnp.eye(3, dtype=self.dtype)
            return
        # For camera angular velocity ω expressed in the camera frame, points
        # move by R_c2<-c1 = exp(-[ω·dt]x). (The reference feeds the gyro
        # through q_CI.inverse() and uses +ω — asl_msckf.cpp:235,
        # corner_detector.cpp:220-244 — which mis-frames the prediction; KLT's
        # large window hides it there. We use the correct sign/frame.)
        rvec = -self.gyro_accum / self.n_gyro * dt
        angle = np.linalg.norm(rvec)
        if angle < 1e-12:
            self.dR = jnp.eye(3, dtype=self.dtype)
        else:
            axis = rvec / angle
            q = np.concatenate([[np.cos(angle / 2)], np.sin(angle / 2) * axis])
            self.dR = quat.to_rotmat(jnp.asarray(q, self.dtype))
        self.gyro_accum = np.zeros(3)
        self.n_gyro = 0

    # ---- frame ingestion (corner_detector.cpp:278-318) ----

    def set_current_image(self, img, time: float):
        self.prev_img = self.cur_img
        self.prev_time = self.cur_time

        # carry over current + new features, then grid dedup
        pts = jnp.concatenate([self.cur_pts, self.new_pts])[: self.F * 2]
        ids = jnp.concatenate([self.cur_ids, self.new_ids])
        valid = jnp.concatenate([self.cur_valid, self.new_valid])
        H, W = (img.shape if self.cur_img is None else self.cur_img.shape)
        pts, ids, valid = _grid_dedup_compact(
            pts, ids, valid, H, W, self.n_rows, self.n_cols, self.F
        )
        self.prev_pts, self.prev_ids, self.prev_valid = pts, ids, valid

        self.cur_img = jnp.asarray(img, self.dtype)
        self.cur_time = float(time)
        self.cur_pts = jnp.zeros((self.F, 2), self.dtype)
        self.cur_ids = jnp.full((self.F,), -1, jnp.int32)
        self.cur_valid = jnp.zeros((self.F,), bool)
        self.new_pts = jnp.zeros((self.F, 2), self.dtype)
        self.new_ids = jnp.full((self.F,), -1, jnp.int32)
        self.new_valid = jnp.zeros((self.F,), bool)

    # ---- tracking (corner_detector.cpp:320-394) ----

    def tracked_features(self):
        """Returns (uv_normalized (F,2), ids (F,), valid (F,))."""
        if self.prev_img is None or not bool(jnp.any(self.prev_valid)):
            self._integrate_gyro()
            return (
                jnp.zeros((self.F, 2), self.dtype),
                jnp.full((self.F,), -1, jnp.int32),
                jnp.zeros((self.F,), bool),
            )

        self._integrate_gyro()
        pred = _predict_homography(self.prev_pts, self.dR, self.K, self.K_inv)

        pts, status = klt.track_features(
            self.prev_img,
            self.cur_img,
            self.prev_pts,
            pred,
            self.prev_valid,
            window_size=self.window_size,
            max_level=self.max_level,
        )
        status = klt.reject_outliers(
            self.prev_pts, pts, status, self.cur_img.shape
        )

        if self.use_ransac:
            prev_n = undistort.undistort_points(
                self.prev_pts, self.K, self.dist_coeffs, self.dist_model
            )
            cur_n = undistort.undistort_points(
                pts, self.K, self.dist_coeffs, self.dist_model
            )
            self._key, sub = jax.random.split(self._key)
            status = status & ransac.two_point_ransac(
                self.dR, prev_n, cur_n, status, sub, self.ransac_threshold
            )

        self.cur_pts = pts
        self.cur_ids = jnp.where(status, self.prev_ids, -1)
        self.cur_valid = status

        uv_norm = undistort.undistort_points(pts, self.K, self.dist_coeffs, self.dist_model)
        return (
            jnp.where(status[:, None], uv_norm, 0.0).astype(self.dtype),
            self.cur_ids,
            status,
        )

    # ---- detection (corner_detector.cpp:396-429) ----

    def new_features(self):
        """Detect new corners avoiding occupied cells; fresh monotone ids."""
        H, W = self.cur_img.shape
        occupied = _occupancy(
            self.cur_pts, self.cur_valid, H, W, self.n_rows, self.n_cols
        )
        xy, score, valid = detect.detect_features(
            self.cur_img,
            occupied,
            self.n_rows,
            self.n_cols,
            self.fast_threshold,
            self.detection_threshold,
        )
        # budget to F slots
        order = jnp.argsort(jnp.logical_not(valid), stable=True)[: self.F]
        xy = xy[order]
        valid = valid[order]

        n_new = int(jnp.sum(valid))
        ids_np = np.full((self.F,), -1, np.int32)
        # reference increments next_feature_id_ once, then per feature (:407-411)
        self.next_feature_id += 1
        ids_np[:n_new] = np.arange(self.next_feature_id, self.next_feature_id + n_new)
        self.next_feature_id += n_new

        # compact so the first n_new rows are the valid ones
        self.new_pts = jnp.where(valid[:, None], xy, 0.0).astype(self.dtype)
        self.new_ids = jnp.asarray(ids_np)
        self.new_valid = valid

        uv_norm = undistort.undistort_points(
            self.new_pts, self.K, self.dist_coeffs, self.dist_model
        )
        return (
            jnp.where(valid[:, None], uv_norm, 0.0).astype(self.dtype),
            self.new_ids,
            valid,
        )

    def clear_tracks(self):
        self.prev_img = None
        self.prev_valid = jnp.zeros((self.F,), bool)
        self.cur_valid = jnp.zeros((self.F,), bool)


@partial(jax.jit, static_argnames=("H", "W", "n_rows", "n_cols"))
def _occupancy(pts, valid, H, W, n_rows, n_cols):
    gh, gw = H // n_rows + 1, W // n_cols + 1
    cell = (pts[:, 1] // gh).astype(jnp.int32) * n_cols + (pts[:, 0] // gw).astype(jnp.int32)
    cell = jnp.clip(cell, 0, n_rows * n_cols - 1)
    occ = jnp.zeros((n_rows * n_cols,), bool)
    return occ.at[jnp.where(valid, cell, n_rows * n_cols)].set(True, mode="drop")


@partial(jax.jit, static_argnames=("H", "W", "n_rows", "n_cols", "out_n"))
def _grid_dedup_compact(pts, ids, valid, H, W, n_rows, n_cols, out_n):
    """Keep the first feature per grid cell (corner_detector.cpp:292-308),
    compacted into out_n slots."""
    gh, gw = H // n_rows + 1, W // n_cols + 1
    n_cells = n_rows * n_cols
    cell = (pts[:, 1] // gh).astype(jnp.int32) * n_cols + (pts[:, 0] // gw).astype(jnp.int32)
    cell = jnp.clip(cell, 0, n_cells - 1)
    order_idx = jnp.arange(pts.shape[0])
    first_in_cell = jax.ops.segment_min(
        jnp.where(valid, order_idx, pts.shape[0]), cell, num_segments=n_cells
    )
    keep = valid & (first_in_cell[cell] == order_idx)

    order = jnp.argsort(jnp.logical_not(keep), stable=True)[:out_n]
    kept = keep[order]
    return (
        jnp.where(kept[:, None], pts[order], 0.0),
        jnp.where(kept, ids[order], -1),
        kept,
    )


@jax.jit
def _predict_homography(pts, dR, K, K_inv):
    """Rotation-only homography prediction H = K·dR·K⁻¹ (cd.cpp:246-276)."""
    Hm = K @ dR @ K_inv
    ones = jnp.ones((pts.shape[0], 1), pts.dtype)
    ph = jnp.concatenate([pts, ones], axis=-1) @ Hm.T
    return ph[:, :2] / jnp.maximum(jnp.abs(ph[:, 2:3]), 1e-12) * jnp.sign(ph[:, 2:3])
