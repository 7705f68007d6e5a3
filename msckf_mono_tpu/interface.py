"""Live streaming VIO interface.

The middleware-free re-design of ``RosInterface``
(/root/reference/include/msckf_mono/ros_interface.h:23-86,
src/ros_interface.cpp): the same callback contract — ``imu_callback`` queues
readings (ros_interface.cpp:22-46), ``image_callback`` drains the queue up to
the image stamp, propagates per reading, feeds gyro to the tracker, then runs
the augment → update → addFeatures → marginalize → prune pipeline
(ros_interface.cpp:48-120) — but publishers become getters
(:meth:`odometry`, :meth:`cam_states`, :meth:`map_points`,
:meth:`track_overlay`) and the filter math is one jitted device program per
frame.

Standstill self-calibration matches ros_interface.cpp:157-206: readings are
buffered until the stand-still window elapses, then b_g = mean gyro, q_IG from
aligning -g with the mean accel, b_a = q·g + mean accel.

The live node skips redundant-state pruning (ros_interface.cpp:111-116);
pass a config with ``filter.use_prune_redundant=False`` to reproduce that.
"""

from __future__ import annotations

from collections import deque
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from msckf_mono_tpu.core import filter as msckf_filter
from msckf_mono_tpu.core.filter import FrameInput
from msckf_mono_tpu.core.init import ground_truth_init, standstill_init
from msckf_mono_tpu.core.types import init_filter_state
from msckf_mono_tpu.frontend.track_handler import TrackHandler
from msckf_mono_tpu.frontend.visualize import TrackVisualizer
from msckf_mono_tpu.utils import quat as quat_ops
from msckf_mono_tpu.utils.config import MsckfConfig


@dataclass
class ImuReading:
    """Mirrors ``imuReading<_S>`` (reference types.h:78-84)."""

    omega: np.ndarray  # (3,)
    acc: np.ndarray    # (3,)
    time: float
    dt: float


class VioInterface:
    """Push-based live pipeline: feed IMU + images, read state back.

    Parameters mirror the ROS-parameter surface the reference loads
    (ros_interface.cpp:221-346) but arrive as one typed :class:`MsckfConfig`.
    """

    def __init__(
        self,
        config: MsckfConfig | None = None,
        stand_still_time: float = 8.0,
        dtype=jnp.float32,
        track_handler_kwargs: dict | None = None,
        keep_visualizer: bool = False,
        collect_archives: bool = True,
    ):
        self.config = config or MsckfConfig()
        self.dtype = dtype
        self.stand_still_time = float(stand_still_time)

        cam = self.config.camera
        K = np.array(
            [[cam.f_u, 0, cam.c_u], [0, cam.f_v, cam.c_v], [0, 0, 1.0]]
        )
        th_kwargs = dict(
            n_grid_rows=10, n_grid_cols=10,
            max_features=self.config.shapes.max_features_per_frame * 2,
        )
        th_kwargs.update(track_handler_kwargs or {})
        self.track_handler = TrackHandler(
            K, cam.distortion_coeffs, cam.distortion_model, dtype=dtype,
            **th_kwargs,
        )
        self.visualizer = TrackVisualizer() if keep_visualizer else None

        self.imu_queue: deque[ImuReading] = deque()
        self.imu_calibrated = False
        self._calib_buffer: list[ImuReading] = []
        self.state = None
        self.frame_count = 0
        self._q_CI = jnp.asarray(cam.q_CI, dtype)
        self._map_accum: list[np.ndarray] = []
        self._pruned_accum: list[dict] = []
        # The cumulative map_/pruned_states_ archives cost device->host
        # transfers every frame; on a tunneled TPU (~0.45 s per dispatch
        # round-trip) users who never call map()/pruned_states() can turn
        # the accumulation off entirely.
        self.collect_archives = bool(collect_archives)

        cfg = self.config
        self._step = jax.jit(lambda s, f: msckf_filter.step(s, f, cfg))
        self._prop_block = jax.jit(
            lambda s, f: msckf_filter.propagate_block(s, f, cfg)
        )
        self._last_image_time = None
        # Device-side times are SECONDS SINCE THE FIRST IMAGE: float32 ULP at
        # an absolute epoch stamp (~1.4e9 s) is ~128 s, which would quantize
        # window/pruned pose timestamps. Getters add the origin back in f64.
        self._time_origin: float | None = None

    # ---- callbacks (ros_interface.h:25-26) ----

    def imu_callback(self, omega, acc, time: float, dt: float | None = None):
        """Queue one IMU reading (ros_interface.cpp:22-46).

        ``dt`` defaults to the gap since the previous reading, like the
        reference's prev_imu_time bookkeeping (ros_interface.cpp:31-43).
        """
        omega = np.asarray(omega, float)
        acc = np.asarray(acc, float)
        if dt is None:
            prev = (
                self.imu_queue[-1].time
                if self.imu_queue
                else (self._calib_buffer[-1].time if self._calib_buffer else None)
            )
            dt = 0.0 if prev is None else time - prev
        reading = ImuReading(omega=omega, acc=acc, time=float(time), dt=float(dt))
        if self.imu_calibrated:
            self.imu_queue.append(reading)
        else:
            self._calib_buffer.append(reading)
            if self._can_initialize_imu():
                self._initialize_imu()

    def image_callback(self, image, time: float):
        """Process one grayscale frame (ros_interface.cpp:48-120).

        Returns True if the filter ran (i.e. the IMU is calibrated).
        """
        if not self.imu_calibrated:
            return False

        if self._time_origin is None:
            self._time_origin = float(time)

        drained = self._drain_imu(time)
        th = self.track_handler
        b_g = np.asarray(self.state.imu.b_g)
        for r in drained:
            th.add_gyro_reading(
                np.asarray(quat_ops.rotate(self._q_CI, jnp.asarray(r.omega - b_g, self.dtype)))
            )

        K = self.config.shapes.imu_per_frame
        blocks = _pack_imu_blocks(drained, K, self.dtype)
        # all-but-last block: pure propagation (the rare >K-readings case)
        for omega, acc, dts in blocks[:-1]:
            frame = _imu_only_frame(omega, acc, dts, self.config, self.dtype)
            self.state = self._prop_block(self.state, frame)
        omega, acc, dts = blocks[-1]

        th.set_current_image(np.asarray(image), time)
        t_uv, t_ids, t_valid = th.tracked_features()
        n_uv, n_ids, n_valid = th.new_features()
        F = self.config.shapes.max_features_per_frame
        tb = _budget(t_uv, t_ids, t_valid, F, self.dtype)
        nb = _budget(n_uv, n_ids, n_valid, F, self.dtype)

        self.frame_count += 1
        frame = FrameInput(
            imu_omega=omega, imu_acc=acc, imu_dt=dts,
            tracked_uv=tb[0], tracked_ids=tb[1], tracked_valid=tb[2],
            new_uv=nb[0], new_ids=nb[1], new_valid=nb[2],
            state_id=jnp.asarray(self.frame_count, jnp.int32),
            time=jnp.asarray(time - self._time_origin, self.dtype),
            frame_valid=jnp.asarray(True),
        )
        self.state, self._last_out = self._step(self.state, frame)
        self._last_image_time = time
        if self.collect_archives:
            self._accumulate_map_and_pruned()

        if self.visualizer is not None:
            self.visualizer.add_current_features(th.cur_pts, th.cur_ids, th.cur_valid)
            self.visualizer.add_new_features(th.new_pts, th.new_ids, th.new_valid)
            self._last_image = np.asarray(image)
        return True

    # ---- standstill init (ros_interface.cpp:157-206) ----

    def _can_initialize_imu(self) -> bool:
        if len(self._calib_buffer) < 2:
            return False
        span = self._calib_buffer[-1].time - self._calib_buffer[0].time
        return span >= self.stand_still_time

    def _initialize_imu(self):
        omega = np.stack([r.omega for r in self._calib_buffer])
        acc = np.stack([r.acc for r in self._calib_buffer])
        imu0 = standstill_init(omega, acc, dtype=self.dtype)
        self.state = init_filter_state(self.config, imu0, dtype=self.dtype)
        self.imu_calibrated = True
        self._calib_buffer.clear()

    def initialize_from_ground_truth(self, p_I_G, q_IG, v_I_G, b_g, b_a):
        """GT-seeded init (asl_msckf.cpp:151-159) — skips standstill calib."""
        imu0 = ground_truth_init(
            p_I_G=p_I_G, q_IG=q_IG, v_I_G=v_I_G, b_g=b_g, b_a=b_a, dtype=self.dtype
        )
        self.state = init_filter_state(self.config, imu0, dtype=self.dtype)
        self.imu_calibrated = True
        self._calib_buffer.clear()

    def _drain_imu(self, stamp: float) -> list[ImuReading]:
        out = []
        while self.imu_queue and self.imu_queue[0].time <= stamp:
            out.append(self.imu_queue.popleft())
        return out

    # ---- getters (the publish_core/publish_extra surface,
    #      ros_interface.cpp:122-155) ----

    def odometry(self) -> dict:
        """Pose + twist of the IMU state (publish_core, ros_interface.cpp:122-143)."""
        imu = self.state.imu
        return {
            "time": self._last_image_time,
            "p_I_G": np.asarray(imu.p_I_G),
            "q_IG": np.asarray(imu.q_IG),
            "v_I_G": np.asarray(imu.v_I_G),
            "b_g": np.asarray(imu.b_g),
            "b_a": np.asarray(imu.b_a),
        }

    def cam_states(self) -> dict:
        """Valid window poses + per-state tracked-feature counts
        (the CamStates msg surface, asl_msckf.cpp:377-403)."""
        w = self.state.window
        valid = np.asarray(w.valid)
        tracked = np.asarray(
            jnp.sum(self.state.tracks.obs_mask & self.state.tracks.active[:, None], axis=0)
        )
        return {
            "q_CG": np.asarray(w.q_CG)[valid],
            "p_C_G": np.asarray(w.p_C_G)[valid],
            "time": np.asarray(w.time)[valid].astype(np.float64)
            + (self._time_origin or 0.0),
            "state_id": np.asarray(w.state_id)[valid],
            "n_tracked": tracked[valid],
        }

    def map_points(self) -> np.ndarray:
        """Last frame's triangulated features (the map pointcloud,
        asl_msckf.cpp:337-352)."""
        mask = np.asarray(self.state.map_mask)
        return np.asarray(self.state.map_pts)[mask]

    def _accumulate_map_and_pruned(self):
        """Host-side accumulation of the reference's unbounded ``map_`` and
        ``pruned_states_`` archives (msckf.h:49-50) from the per-frame
        device buffers.

        All per-frame archive buffers come back in ONE ``jax.device_get``
        (one tunnel round-trip per frame instead of up to nine) and are
        filtered host-side.
        """
        s = self.state
        (m, mp, tm, tp, pm, pid, pt, pq, pp) = jax.device_get(
            (s.map_mask, s.map_pts, s.tri_map_mask, s.tri_map_pts,
             s.pruned_mask, s.pruned_ids, s.pruned_time, s.pruned_q, s.pruned_p)
        )
        m, tm, pm = np.asarray(m), np.asarray(tm), np.asarray(pm)
        if m.any():
            self._map_accum.append(np.asarray(mp)[m])
        if tm.any():
            self._map_accum.append(np.asarray(tp)[tm])
        if pm.any():
            self._pruned_accum.append(
                dict(
                    state_id=np.asarray(pid)[pm],
                    time=np.asarray(pt)[pm].astype(np.float64)
                    + (self._time_origin or 0.0),
                    q_CG=np.asarray(pq)[pm],
                    p_C_G=np.asarray(pp)[pm],
                )
            )

    def map(self) -> np.ndarray:
        """CUMULATIVE map: every feature triangulated over the whole run —
        the reference's ``map_`` / ``getMap()`` (msckf.h:50, :820-823,
        published asl_msckf.cpp:337-352)."""
        if not self._map_accum:
            return np.zeros((0, 3))
        return np.concatenate(self._map_accum, axis=0)

    def pruned_states(self) -> dict:
        """Archived camera poses at their removal, sorted by state_id —
        the reference's ``pruned_states_`` / ``getPrunedStates()``
        (msckf.h:49, :840-848; pruned-path publisher asl_msckf.cpp:405-428)."""
        if not self._pruned_accum:
            return {"state_id": np.zeros((0,), np.int32),
                    "time": np.zeros((0,)),
                    "q_CG": np.zeros((0, 4)), "p_C_G": np.zeros((0, 3))}
        cat = {k: np.concatenate([d[k] for d in self._pruned_accum])
               for k in self._pruned_accum[0]}
        order = np.argsort(cat["state_id"], kind="stable")
        return {k: v[order] for k, v in cat.items()}

    def finish(self):
        """End-of-sequence: residualize every remaining track in one final
        update (MSCKF::finish, reference msckf.h:765-807). Points
        triangulated by the final passes join the cumulative map."""
        cfg = self.config
        self.state, pts, mask = jax.jit(
            lambda s: msckf_filter.finish(s, cfg, collect_map=True)
        )(self.state)
        m = np.asarray(mask)
        if m.any():
            self._map_accum.append(np.asarray(pts)[m])

    def track_overlay(self) -> np.ndarray:
        """RGB debug image with tracks drawn (ros_interface.cpp:145-155)."""
        if self.visualizer is None or getattr(self, "_last_image", None) is None:
            raise RuntimeError("construct with keep_visualizer=True")
        return self.visualizer.draw(self._last_image)


def _budget(uv, ids, valid, F, dtype):
    order = jnp.argsort(jnp.logical_not(valid), stable=True)[:F]
    return uv[order].astype(dtype), ids[order].astype(jnp.int32), valid[order]


def _pack_imu_blocks(readings, K, dtype):
    """Split drained readings into ceil(n/K) blocks of K (dt=0 padding)."""
    n = len(readings)
    n_blocks = max(1, -(-n // K))
    blocks = []
    for b in range(n_blocks):
        chunk = readings[b * K : (b + 1) * K]
        omega = np.zeros((K, 3))
        acc = np.zeros((K, 3))
        dts = np.zeros((K,))
        for i, r in enumerate(chunk):
            omega[i], acc[i], dts[i] = r.omega, r.acc, r.dt
        blocks.append(
            (jnp.asarray(omega, dtype), jnp.asarray(acc, dtype), jnp.asarray(dts, dtype))
        )
    return blocks


def _imu_only_frame(omega, acc, dts, config, dtype):
    F = config.shapes.max_features_per_frame
    z = jnp.zeros((F, 2), dtype)
    ninf = jnp.full((F,), -1, jnp.int32)
    false = jnp.zeros((F,), bool)
    return FrameInput(
        imu_omega=omega, imu_acc=acc, imu_dt=dts,
        tracked_uv=z, tracked_ids=ninf, tracked_valid=false,
        new_uv=z, new_ids=ninf, new_valid=false,
        state_id=jnp.asarray(-1, jnp.int32),
        time=jnp.asarray(0.0, dtype),
        frame_valid=jnp.asarray(False),
    )
