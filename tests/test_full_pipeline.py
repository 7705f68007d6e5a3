"""Images -> TrackHandler -> filter: the full pipeline on rendered frames.

The image-domain counterpart of test_end_to_end (BASELINE.md config-4 shape):
FAST detection, gyro-predicted pyramidal KLT, undistortion, and the MSCKF all
run in the loop; only the imagery is synthetic.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from msckf_mono_tpu.core import filter as msckf_filter
from msckf_mono_tpu.core.filter import FrameInput
from msckf_mono_tpu.core.init import ground_truth_init
from msckf_mono_tpu.core.types import init_filter_state
from msckf_mono_tpu.data import render, synthetic
from msckf_mono_tpu.eval.ate import ate_rmse, final_drift
from msckf_mono_tpu.frontend.track_handler import TrackHandler
from msckf_mono_tpu.utils.config import MsckfConfig
from msckf_mono_tpu.utils import quat as quat_ops


@pytest.mark.slow
def test_images_to_trajectory():
    cfg = MsckfConfig()
    n_frames = 40
    seq, world = synthetic.generate(
        cfg, n_frames=n_frames, seed=0, pixel_noise=0.0, n_landmarks=500,
        return_world=True,
    )

    K = np.array(
        [[cfg.camera.f_u, 0, cfg.camera.c_u], [0, cfg.camera.f_v, cfg.camera.c_v], [0, 0, 1]]
    )
    th = TrackHandler(
        K, cfg.camera.distortion_coeffs, "radtan",
        n_grid_rows=10, n_grid_cols=10, max_features=100,
        window_size=21, max_level=3,
    )

    dtype = jnp.float32
    imu = ground_truth_init(
        p_I_G=seq.gt_p[0] * 0 + np.array([5.0, 0.0, 0.0]),
        q_IG=[1, 0, 0, 0],
        v_I_G=[0.0, 5.0 * 0.35, 0.2 * 1.4],
        b_g=seq.b_g, b_a=seq.b_a, dtype=dtype,
    )
    state = init_filter_state(cfg, imu, dtype=dtype)
    step = jax.jit(lambda s, f: msckf_filter.step(s, f, cfg))

    F = cfg.shapes.max_features_per_frame
    q_CI = jnp.asarray(cfg.camera.q_CI, dtype)

    def budget(uv, ids, valid):
        order = jnp.argsort(jnp.logical_not(valid), stable=True)[:F]
        return uv[order], ids[order].astype(jnp.int32), valid[order]

    est = []
    for i in range(n_frames):
        img = render.render_frame(cfg, world, i)

        # feed gyro readings (camera frame) for the warp prediction
        for k in range(cfg.shapes.imu_per_frame):
            w_imu = jnp.asarray(seq.imu_omega[i, k] - seq.b_g, dtype)
            th.add_gyro_reading(np.asarray(quat_ops.rotate(q_CI, w_imu)))

        th.set_current_image(img, float(seq.time[i]))
        t_uv, t_ids, t_valid = th.tracked_features()
        n_uv, n_ids, n_valid = th.new_features()

        frame = FrameInput(
            imu_omega=jnp.asarray(seq.imu_omega[i], dtype),
            imu_acc=jnp.asarray(seq.imu_acc[i], dtype),
            imu_dt=jnp.asarray(seq.imu_dt[i], dtype),
            tracked_uv=budget(t_uv, t_ids, t_valid)[0].astype(dtype),
            tracked_ids=budget(t_uv, t_ids, t_valid)[1],
            tracked_valid=budget(t_uv, t_ids, t_valid)[2],
            new_uv=budget(n_uv, n_ids, n_valid)[0].astype(dtype),
            new_ids=budget(n_uv, n_ids, n_valid)[1],
            new_valid=budget(n_uv, n_ids, n_valid)[2],
            state_id=jnp.asarray(i + 1, jnp.int32),
            time=jnp.asarray(seq.time[i], dtype),
            frame_valid=jnp.asarray(True),
        )
        state, out = step(state, frame)
        est.append(np.asarray(out.p_I_G))

    est = np.asarray(est)
    gt = seq.gt_p
    assert np.all(np.isfinite(est))
    drift = final_drift(est, gt)
    ate = ate_rmse(est, gt)
    # image pipeline has detection/tracking noise; keep a loose gate
    assert int(state.num_residualized) > 5, "front-end produced no usable tracks"
    assert drift < 1.0, f"drift {drift:.3f}"
    assert ate < 0.8, f"ate {ate:.3f}"
