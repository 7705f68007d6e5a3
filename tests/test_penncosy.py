"""PennCOSYVIO reader tests against a generated on-disk fixture.

The reference's PennCOSYVIO support is bit-rotted (does not compile,
/root/reference/datasets/penncosy_readers.cpp:192); these tests pin the
restored layout handling (data/penncosy.py)."""

import os

import numpy as np
import pytest

from msckf_mono_tpu.data import penncosy


@pytest.fixture(scope="module")
def fixture_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("penncosy")
    base = root / "data" / "visensor" / "af"
    frames = base / "left_cam_frames"
    frames.mkdir(parents=True)

    (base / "left.yaml").write_text(
        """%YAML:1.0
T_BS:
  rows: 4
  cols: 4
  data: [0.0, 0.0, 1.0, 0.05,
         -1.0, 0.0, 0.0, 0.01,
         0.0, -1.0, 0.0, -0.02,
         0.0, 0.0, 0.0, 1.0]
rate_hz: 20
resolution: [752, 480]
intrinsics: [460.0, 459.0, 370.0, 240.0]
distortion_model: radtan
distortion_coefficients: [-0.29, 0.08, 0.0, 0.0]
"""
    )
    from PIL import Image

    lines = []
    for i in range(5):
        t = 100.0 + i * 0.05
        lines.append(f"{t:.6f}")
        Image.fromarray(np.zeros((480, 752), np.uint8)).save(
            frames / f"frame_{i + 1:04d}.png"
        )
    (base / "left_cam.txt").write_text("\n".join(lines) + "\n")

    rows = []
    for i in range(50):
        t = 100.0 + i * 0.005
        rows.append(f"{t:.6f} 0.1 -0.2 9.81 {0.01 * i:.4f} -0.02 0.3")
    (base / "imu.txt").write_text("\n".join(rows) + "\n")
    return str(root)


def test_read_vi_camera(fixture_root):
    cam = penncosy.read_vi_camera(fixture_root, "visensor", "af")
    assert len(cam.image_files) == 5
    assert cam.width == 752 and cam.height == 480
    assert os.path.basename(cam.image_files[0]) == "frame_0001.png"
    assert os.path.exists(cam.image_files[0])
    np.testing.assert_allclose(cam.K[0, 0], 460.0)
    # timestamps in ns
    assert cam.timestamps[0] == 100_000_000_000
    assert cam.timestamps[1] - cam.timestamps[0] == 50_000_000
    # T_BS rotation inverted (penncosy_readers.cpp:35)
    from msckf_mono_tpu.utils import quat
    import jax.numpy as jnp

    R_q = np.asarray(quat.to_rotmat(jnp.asarray(cam.q_BS)))
    np.testing.assert_allclose(R_q, cam.T_BS[:3, :3].T, atol=1e-12)


def test_read_vi_imu(fixture_root):
    imu = penncosy.read_vi_imu(fixture_root, "visensor", "af")
    assert imu.dT == 1.0 / 200.0  # hardcoded rate (penncosy_readers.cpp:163)
    assert imu.omega.shape == (50, 3)
    # accel columns precede gyro (penncosy_readers.cpp:195-203)
    np.testing.assert_allclose(imu.acc[0], [0.1, -0.2, 9.81])
    np.testing.assert_allclose(imu.omega[3], [0.03, -0.02, 0.3])
    assert imu.timestamps[1] - imu.timestamps[0] == 5_000_000


@pytest.fixture(scope="module")
def written_pcv(tmp_path_factory):
    from msckf_mono_tpu.data import synthetic, write_penncosy
    from msckf_mono_tpu.utils.config import MsckfConfig

    cfg = MsckfConfig()
    seq, world = synthetic.generate(
        cfg, n_frames=25, seed=3, pixel_noise=0.0, n_landmarks=500,
        return_world=True,
    )
    root = str(tmp_path_factory.mktemp("pcv_root"))
    info = write_penncosy.write_sequence(root, cfg, seq, world)
    return cfg, seq, world, root, info


def test_pcv_read_sequence_roundtrip(written_pcv):
    cfg, seq, world, root, info = written_pcv
    rd = penncosy.read_sequence(root)
    assert len(rd.cam.image_files) == 25
    assert rd.gt is not None
    # IMU round-trips: accel/gyro column order is the pcv quirk
    n = seq.imu_omega.shape[0] * seq.imu_omega.shape[1]
    np.testing.assert_allclose(
        rd.imu.omega[:n], seq.imu_omega.reshape(n, 3), rtol=1e-12
    )
    np.testing.assert_allclose(
        rd.imu.acc[:n], seq.imu_acc.reshape(n, 3), rtol=1e-12
    )
    # ns-exact timestamps despite the second-denominated float format
    assert rd.imu.timestamps[0] == info["t0_ns"] + 5_000_000
    np.testing.assert_array_equal(rd.cam.timestamps, info["frame_ts"])


@pytest.mark.slow
def test_run_pcv_cli_end_to_end(written_pcv, tmp_path, capsys):
    """The restored PennCOSYVIO runner (reference penncosy_msckf.cpp:43-123,
    abandoned there) end-to-end: pcv layout -> front-end -> filter -> ATE."""
    import json

    cfg, seq, world, root, info = written_pcv
    from msckf_mono_tpu.cli import run_euroc

    out = str(tmp_path / "traj.npz")
    run_euroc.main(
        [
            "--data", root,
            "--dataset", "pcv",
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
