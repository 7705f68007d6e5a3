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
