"""ASL writer round-trip + full dataset->CLI integration.

Writes a synthetic world as an on-disk EuRoC tree (rendered PNGs + CSVs) and
(1) checks the readers invert the writer's conventions exactly,
(2) drives the run_euroc CLI end-to-end over it: native CSV parse, PNG
decode, sync/bucketing, KLT front-end, filter, ATE.
"""

import json
import os

import numpy as np
import pytest

from msckf_mono_tpu.data import asl, synthetic, write_asl
from msckf_mono_tpu.utils.config import MsckfConfig


@pytest.fixture(scope="module")
def written(tmp_path_factory):
    cfg = MsckfConfig()
    seq, world = synthetic.generate(
        cfg, n_frames=25, seed=3, pixel_noise=0.0, n_landmarks=500,
        return_world=True,
    )
    root = str(tmp_path_factory.mktemp("synthetic_mav0"))
    info = write_asl.write_sequence(root, cfg, seq, world)
    return cfg, seq, world, root, info


def test_roundtrip_ground_truth(written):
    cfg, seq, world, root, info = written
    rd = asl.read_sequence(root)
    assert rd.gt is not None
    # GT at frame indices equals synthetic gt (conventions cancel exactly)
    k = world.frame_idx[4]
    gi = int(np.argmin(np.abs(rd.gt.timestamps - (info["t0_ns"] + k * write_asl.IMU_DT_NS))))
    np.testing.assert_allclose(rd.gt.p[gi], seq.gt_p[4], atol=1e-12)
    np.testing.assert_allclose(rd.gt.q[gi], seq.gt_q[4], atol=1e-9)
    np.testing.assert_allclose(rd.gt.v[gi], seq.gt_v[4], atol=1e-9)
    np.testing.assert_allclose(rd.gt.b_g[gi], seq.b_g, atol=1e-15)


def test_roundtrip_imu_and_camera(written):
    cfg, seq, world, root, info = written
    rd = asl.read_sequence(root)
    n_imu = seq.imu_omega.shape[0] * seq.imu_omega.shape[1]
    assert rd.imu.omega.shape == (n_imu, 3)
    np.testing.assert_allclose(
        rd.imu.omega, seq.imu_omega.reshape(n_imu, 3), atol=1e-15
    )
    np.testing.assert_allclose(rd.imu.acc, seq.imu_acc.reshape(n_imu, 3), atol=1e-15)
    # extrinsics round-trip through the T_BS inversion (up to normalization:
    # the config default quaternion is not exactly unit norm)
    q_ci = np.asarray(cfg.camera.q_CI)
    np.testing.assert_allclose(rd.cam.q_BS, q_ci / np.linalg.norm(q_ci), rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(rd.cam.p_BS, np.asarray(cfg.camera.p_C_I), atol=1e-12)
    img = rd.cam.read_image(0)
    assert img.shape == (cfg.camera.height, cfg.camera.width)
    assert img.max() > 100  # rendered dots present

    # prefetcher path decodes identically to the sync reader
    with rd.cam.prefetcher(n_threads=2, lookahead=4) as pf:
        np.testing.assert_array_equal(pf.get(3), rd.cam.read_image(3).astype(np.uint8))


@pytest.mark.slow
def test_run_euroc_cli_end_to_end(written, tmp_path, capsys):
    cfg, seq, world, root, info = written
    from msckf_mono_tpu.cli import run_euroc

    out = str(tmp_path / "traj.npz")
    run_euroc.main(
        [
            "--data", root,
            "--cpu",
            "--init", "gt",
            "--stand-still-end", str(info["t0_ns"] / 1e9),
            "--finish",
            "--out", out,
        ]
    )
    report = json.loads(capsys.readouterr().out)
    assert report["frames"] == 25
    assert report["ate_rmse"] < 0.5, report
    assert report["final_drift"] < 1.0, report
    assert os.path.exists(out)
    # --out carries the full reference output surface: trajectory + cumulative
    # map + pruned-pose archive (msckf.h:820-848, asl_msckf.cpp:337-428)
    import numpy as np

    dat = np.load(out)
    assert dat["est"].shape == (25, 3)
    assert dat["map"].ndim == 2 and dat["map"].shape[1] == 3
    for k in ("pruned_state_id", "pruned_time", "pruned_q_CG", "pruned_p_C_G"):
        assert k in dat
    assert len(dat["map"]) > 0  # 25 frames of a tracked world triangulate
