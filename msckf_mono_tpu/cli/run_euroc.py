#!/usr/bin/env python
"""Offline EuRoC/ASL runner: dataset -> front-end -> filter -> ATE.

The equivalent of /root/reference/datasets/asl_msckf.cpp (ground-truth-seeded
init, asl_msckf.cpp:141-159) and asl_msckf_no_ground_truth.cpp (standstill
self-calibration) in one CLI. No ROS: images stream through the jnp front-end,
the filter runs as one jitted step per frame, and evaluation is quantitative
(ATE/drift) instead of an RViz overlay.

Usage:
  python -m msckf_mono_tpu.cli.run_euroc --data /path/to/MH_03_medium/mav0 \
      --stand-still-end 1403637129.5 [--max-frames 500] [--init standstill]
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", required=True,
                    help="asl: .../<sequence>/mav0;  pcv: the dataset root")
    ap.add_argument("--dataset", choices=["asl", "pcv"], default="asl",
                    help="asl = EuRoC layout; pcv = PennCOSYVIO layout "
                         "(the runner the reference abandoned, "
                         "penncosy_msckf.cpp:43-123)")
    ap.add_argument("--pcv-sensor", default="visensor")
    ap.add_argument("--pcv-seq", default="af")
    ap.add_argument("--stand-still-end", type=float, default=None,
                    help="end of the standstill window, seconds (unix epoch)")
    ap.add_argument("--init", choices=["gt", "standstill"], default="gt")
    ap.add_argument("--max-frames", type=int, default=None)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--finish", action="store_true",
                    help="final residualization of all live tracks (msckf.h:765-807)")
    ap.add_argument("--out", type=str, default=None)
    args = ap.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from msckf_mono_tpu.core import filter as msckf_filter
    from msckf_mono_tpu.core.filter import FrameInput
    from msckf_mono_tpu.core.init import ground_truth_init, standstill_init
    from msckf_mono_tpu.core.types import init_filter_state
    from msckf_mono_tpu.data import asl, sync
    from msckf_mono_tpu.eval.ate import ate_rmse, final_drift
    from msckf_mono_tpu.frontend.track_handler import TrackHandler
    from msckf_mono_tpu.utils import quat as quat_ops
    from msckf_mono_tpu.utils.config import CameraConfig, MsckfConfig

    dtype = jnp.float32
    if args.dataset == "pcv":
        from msckf_mono_tpu.data import penncosy

        seq = penncosy.read_sequence(args.data, args.pcv_sensor, args.pcv_seq)
    else:
        seq = asl.read_sequence(args.data)
    cam = seq.cam

    # camera config from the dataset calibration (ros_interface.cpp:250-274)
    cfg = MsckfConfig(
        camera=CameraConfig(
            f_u=float(cam.K[0, 0]), f_v=float(cam.K[1, 1]),
            c_u=float(cam.K[0, 2]), c_v=float(cam.K[1, 2]),
            q_CI=tuple(cam.q_BS), p_C_I=tuple(cam.p_BS),
            width=cam.width, height=cam.height,
            distortion_model=cam.distortion_model,
            distortion_coeffs=tuple(cam.distortion_coeffs),
        )
    )

    ss_end_ns = int(args.stand_still_end * 1e9) if args.stand_still_end else (
        int(seq.imu.timestamps[0]) + 2_000_000_000
    )

    # --- init (asl_msckf.cpp:141-159 / asl_msckf_no_ground_truth.cpp:141-173) ---
    if args.init == "gt" and seq.gt is not None:
        gi = sync.closest_gt_index(seq.gt.timestamps, ss_end_ns)
        imu0 = ground_truth_init(
            p_I_G=seq.gt.p[gi], q_IG=seq.gt.q[gi], v_I_G=seq.gt.v[gi],
            b_g=seq.gt.b_g[gi], b_a=seq.gt.b_a[gi], dtype=dtype,
        )
    else:
        mask = seq.imu.timestamps < ss_end_ns
        imu0 = standstill_init(seq.imu.omega[mask], seq.imu.acc[mask], dtype=dtype)

    # --- pack sensors ---
    frame_ts = sync.select_frames(seq, start_time_ns=ss_end_ns, max_frames=args.max_frames)
    frame_index_offset = int(np.searchsorted(cam.timestamps, frame_ts[0]))
    packed = sync.bucket_imu(
        seq.imu.timestamps, seq.imu.omega, seq.imu.acc, seq.imu.dT,
        frame_ts, cfg.shapes.imu_per_frame, start_ts=ss_end_ns,
    )
    if packed.dropped:
        print(f"warning: {packed.dropped} IMU samples over the per-frame budget", file=sys.stderr)

    th = TrackHandler(
        cam.K, cam.distortion_coeffs, cam.distortion_model,
        n_grid_rows=10, n_grid_cols=10, max_features=100,
        # ONE shipped KLT window across the repo (bench.py serving config
        # matches): 21 px / 4 levels, decided on the world-anchored
        # static-texture render world (KLT_WINDOW_AB.json, round 5:
        # ATE 0.236 at 21/4 vs 0.300 at 31/5 vs 0.823 at the reference's
        # 51/5 — large windows genuinely mix motion across the world's
        # depth discontinuities; no per-frame-noise artifact remains).
        window_size=21, max_level=3,
    )

    state = init_filter_state(cfg, imu0, dtype=dtype)
    step = jax.jit(lambda s, f: msckf_filter.step(s, f, cfg))
    F = cfg.shapes.max_features_per_frame
    q_CI = jnp.asarray(cfg.camera.q_CI, dtype)

    def budget(uv, ids, valid):
        order = jnp.argsort(jnp.logical_not(valid), stable=True)[:F]
        return uv[order].astype(dtype), ids[order].astype(jnp.int32), valid[order]

    est = []
    map_accum = []     # cumulative map_ (msckf.h:50)
    pruned_accum = []  # pruned_states_ rows: [state_id, time, q(4), p(3)]
    t_start = time.perf_counter()
    b_g_est = np.asarray(imu0.b_g)
    # threaded decode-ahead (native/loader.cpp): image decode overlaps with
    # the device step
    prefetch = cam.prefetcher(n_threads=4, lookahead=16)
    for i, ts in enumerate(frame_ts):
        img = prefetch.get(frame_index_offset + i).astype(np.float32)

        for k in range(cfg.shapes.imu_per_frame):
            if packed.dt[i, k] > 0:
                w_imu = jnp.asarray(packed.omega[i, k] - b_g_est, dtype)
                th.add_gyro_reading(np.asarray(quat_ops.rotate(q_CI, w_imu)))

        th.set_current_image(img, ts / 1e9)
        t_uv, t_ids, t_valid = th.tracked_features()
        n_uv, n_ids, n_valid = th.new_features()
        tb, nb = budget(t_uv, t_ids, t_valid), budget(n_uv, n_ids, n_valid)

        frame = FrameInput(
            imu_omega=jnp.asarray(packed.omega[i], dtype),
            imu_acc=jnp.asarray(packed.acc[i], dtype),
            imu_dt=jnp.asarray(packed.dt[i], dtype),
            tracked_uv=tb[0], tracked_ids=tb[1], tracked_valid=tb[2],
            new_uv=nb[0], new_ids=nb[1], new_valid=nb[2],
            state_id=jnp.asarray(i + 1, jnp.int32),
            # SECONDS SINCE SEQUENCE START, not absolute epoch: float32 ULP at
            # a ~1.4e9 s EuRoC stamp is ~128 s, which would quantize every
            # archived pruned-pose timestamp into ~2-minute steps (the
            # reference stores camState.time as double). Absolute times are
            # reconstructed host-side in float64 from state_id at export.
            time=jnp.asarray((ts - frame_ts[0]) / 1e9, dtype),
            frame_valid=jnp.asarray(True),
        )
        state, out = step(state, frame)
        est.append(np.asarray(out.p_I_G))
        b_g_est = np.asarray(state.imu.b_g)
        # cumulative map + pruned-pose archive (reference msckf.h:49-50;
        # published asl_msckf.cpp:337-352 and :405-428)
        m = np.asarray(state.map_mask)
        if m.any():
            map_accum.append(np.asarray(state.map_pts)[m])
        tm = np.asarray(state.tri_map_mask)
        if tm.any():
            map_accum.append(np.asarray(state.tri_map_pts)[tm])
        pm = np.asarray(state.pruned_mask)
        if pm.any():
            pruned_accum.append(np.concatenate([
                np.asarray(state.pruned_ids)[pm, None].astype(np.float64),
                np.asarray(state.pruned_time)[pm, None],
                np.asarray(state.pruned_q)[pm],
                np.asarray(state.pruned_p)[pm],
            ], axis=1))
        if i % 100 == 0:
            print(f"frame {i}/{len(frame_ts)}", file=sys.stderr)

    prefetch.close()
    if args.finish:
        state, fpts, fmask = jax.jit(
            lambda s: msckf_filter.finish(s, cfg, collect_map=True)
        )(state)
        est[-1] = np.asarray(state.imu.p_I_G)
        fm = np.asarray(fmask)
        if fm.any():
            map_accum.append(np.asarray(fpts)[fm])

    wall = time.perf_counter() - t_start
    est = np.asarray(est)

    report = {"frames": len(frame_ts), "wall_s": round(wall, 2),
              "fps": round(len(frame_ts) / wall, 2)}
    if seq.gt is not None:
        gt_p, _, _ = sync.gt_at_frames(seq.gt, frame_ts)
        report["ate_rmse"] = ate_rmse(est, gt_p)
        report["final_drift"] = final_drift(est, gt_p)
    print(json.dumps(report, indent=2))

    if args.out:
        map_pts = (np.concatenate(map_accum) if map_accum
                   else np.zeros((0, 3), np.float32))
        pruned = (np.concatenate(pruned_accum) if pruned_accum
                  else np.zeros((0, 9)))
        pruned = pruned[np.argsort(pruned[:, 0], kind="stable")]
        pruned_ids = pruned[:, 0].astype(np.int32)
        # Exact float64 absolute stamps, reconstructed from state_id via the
        # host-side frame_ts array (state_id = frame index + 1); the f32
        # device buffer only carries seconds-since-start.
        pruned_time = (frame_ts[np.clip(pruned_ids - 1, 0, len(frame_ts) - 1)]
                       / 1e9 if len(pruned_ids) else pruned[:, 1])
        np.savez(
            args.out, est=est, time=frame_ts / 1e9,
            map=map_pts,                     # cumulative map_ (msckf.h:820-823)
            pruned_state_id=pruned_ids,
            pruned_time=pruned_time,
            pruned_q_CG=pruned[:, 2:6],      # pruned path (msckf.h:840-848)
            pruned_p_C_G=pruned[:, 6:9],
        )


if __name__ == "__main__":
    main()
