"""Functional front-end + fused device pipeline (pixels->filter in one scan)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from msckf_mono_tpu.core import pipeline
from msckf_mono_tpu.core.init import ground_truth_init
from msckf_mono_tpu.core.types import init_filter_state
from msckf_mono_tpu.data import render, synthetic
from msckf_mono_tpu.eval.ate import final_drift
from msckf_mono_tpu.frontend import functional
from msckf_mono_tpu.frontend.functional import FrontendConfig
from msckf_mono_tpu.utils.config import MsckfConfig


def _image_frames(cfg, seq, world, n_frames, dtype=jnp.float32):
    imgs = np.stack([render.render_frame(cfg, world, i) for i in range(n_frames)])
    return pipeline.ImageFrameInput(
        image=jnp.asarray(imgs, dtype),
        imu_omega=jnp.asarray(seq.imu_omega[:n_frames], dtype),
        imu_acc=jnp.asarray(seq.imu_acc[:n_frames], dtype),
        imu_dt=jnp.asarray(seq.imu_dt[:n_frames], dtype),
        state_id=jnp.arange(1, n_frames + 1, dtype=jnp.int32),
        time=jnp.asarray(seq.time[:n_frames], dtype),
        frame_valid=jnp.ones((n_frames,), bool),
    )


def test_frontend_step_tracks_and_ids():
    """Pure front-end: new features on frame 1, stable ids on frame 2."""
    cfg = MsckfConfig()
    fcfg = FrontendConfig(max_features=64, window_size=21, max_level=3)
    seq, world = synthetic.generate(
        cfg, n_frames=3, seed=1, pixel_noise=0.0, n_landmarks=400, return_world=True
    )
    H, W = cfg.camera.height, cfg.camera.width
    fstate = functional.init_frontend_state(H, W, fcfg)
    step = functional.make_jitted_step(cfg, fcfg)

    eye = jnp.eye(3, dtype=jnp.float32)
    img0 = jnp.asarray(render.render_frame(cfg, world, 0), jnp.float32)
    fstate, out0 = step(fstate, img0, eye)
    n_new0 = int(out0.new_valid.sum())
    assert n_new0 > 20, "first frame should detect corners"
    assert int(out0.tracked_valid.sum()) == 0
    ids0 = np.asarray(out0.new_ids)[np.asarray(out0.new_valid)]
    assert ids0.min() >= 1 and len(set(ids0.tolist())) == n_new0

    img1 = jnp.asarray(render.render_frame(cfg, world, 1), jnp.float32)
    fstate, out1 = step(fstate, img1, eye)
    n_tracked = int(out1.tracked_valid.sum())
    assert n_tracked > 0.5 * n_new0, "most corners should survive KLT"
    # tracked ids are a subset of frame-0 ids
    tids = set(np.asarray(out1.tracked_ids)[np.asarray(out1.tracked_valid)].tolist())
    assert tids <= set(ids0.tolist())
    # new ids strictly above all previous
    nids1 = np.asarray(out1.new_ids)[np.asarray(out1.new_valid)]
    if len(nids1):
        assert nids1.min() > max(ids0)


@pytest.mark.slow
def test_fused_pipeline_scan():
    cfg = MsckfConfig()
    fcfg = FrontendConfig(max_features=100, window_size=21, max_level=3)
    n_frames = 16
    seq, world = synthetic.generate(
        cfg, n_frames=n_frames, seed=0, pixel_noise=0.0, n_landmarks=500,
        return_world=True,
    )
    dtype = jnp.float32
    imu = ground_truth_init(
        p_I_G=[5.0, 0.0, 0.0], q_IG=[1, 0, 0, 0],
        v_I_G=[0.0, 5.0 * 0.35, 0.2 * 1.4],
        b_g=seq.b_g, b_a=seq.b_a, dtype=dtype,
    )
    state = init_filter_state(cfg, imu, dtype=dtype)
    fstate = functional.init_frontend_state(cfg.camera.height, cfg.camera.width, fcfg, dtype)
    frames = _image_frames(cfg, seq, world, n_frames, dtype)

    run = jax.jit(lambda s, fs, f: pipeline.run_images(s, fs, f, cfg, fcfg))
    final, ffinal, outs = run(state, fstate, frames)

    est = np.asarray(outs.p_I_G)
    assert np.all(np.isfinite(est))
    assert final_drift(est, seq.gt_p[:n_frames]) < 1.0
    assert int(final.num_residualized) >= 0
    assert int(ffinal.next_id) > 50
