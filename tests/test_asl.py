"""ASL/EuRoC reader tests against a generated on-disk fixture dataset."""

import os

import numpy as np
import pytest

from msckf_mono_tpu.data import asl, sync


@pytest.fixture(scope="module")
def fixture_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("mav0")

    # --- cam0 ---
    cam = root / "cam0"
    (cam / "data").mkdir(parents=True)
    (cam / "sensor.yaml").write_text(
        """%YAML:1.0
sensor_type: camera
T_BS:
  rows: 4
  cols: 4
  data: [0.0, 0.0, 1.0, 0.1,
         -1.0, 0.0, 0.0, 0.02,
         0.0, -1.0, 0.0, -0.03,
         0.0, 0.0, 0.0, 1.0]
rate_hz: 20
resolution: [752, 480]
camera_model: pinhole
intrinsics: [458.654, 457.296, 367.215, 248.375]
distortion_model: radtan
distortion_coefficients: [-0.28, 0.07, 0.0002, 0.00002]
"""
    )
    cam_ts = (np.arange(10) * 50_000_000 + 1_000_000_000).astype(np.int64)
    lines = ["#timestamp [ns],filename"]
    from PIL import Image

    for t in cam_ts:
        fn = f"{t}.png"
        Image.fromarray(np.zeros((480, 752), np.uint8)).save(cam / "data" / fn)
        lines.append(f"{t},{fn}")
    (cam / "data.csv").write_text("\n".join(lines))

    # --- imu0 ---
    imu = root / "imu0"
    imu.mkdir()
    (imu / "sensor.yaml").write_text(
        """%YAML:1.0
sensor_type: imu
T_BS:
  rows: 4
  cols: 4
  data: [1,0,0,0, 0,1,0,0, 0,0,1,0, 0,0,0,1]
rate_hz: 200
gyroscope_noise_density: 1.6968e-04
gyroscope_random_walk: 1.9393e-05
accelerometer_noise_density: 2.0000e-3
accelerometer_random_walk: 3.0000e-3
"""
    )
    imu_ts = (np.arange(100) * 5_000_000 + 1_000_000_000 - 45 * 5_000_000).astype(np.int64)
    rows = ["#timestamp,wx,wy,wz,ax,ay,az"]
    for i, t in enumerate(imu_ts):
        rows.append(f"{t},{0.01*i},{-0.02},{0.3},{0.1},{-0.2},{9.81}")
    (imu / "data.csv").write_text("\n".join(rows))

    # --- ground truth ---
    gt = root / "state_groundtruth_estimate0"
    gt.mkdir()
    (gt / "sensor.yaml").write_text(
        """%YAML:1.0
sensor_type: visual-inertial
T_BS:
  rows: 4
  cols: 4
  data: [1,0,0,0, 0,1,0,0, 0,0,1,0, 0,0,0,1]
"""
    )
    rows = ["#ts,p,q,v,bw,ba"]
    for i, t in enumerate(imu_ts[::2]):
        rows.append(
            f"{t},{0.1*i},{0.2*i},{0.0},1.0,0.0,0.0,0.0,{0.5},{0.1},{0.0},"
            f"0.001,0.002,0.003,0.01,0.02,0.03"
        )
    (gt / "data.csv").write_text("\n".join(rows))

    return str(root)


def test_read_camera(fixture_root):
    cam = asl.read_camera(os.path.join(fixture_root, "cam0"))
    assert cam.rate_hz == 20
    assert cam.width == 752 and cam.height == 480
    assert len(cam.image_files) == 10
    np.testing.assert_allclose(cam.K[0, 0], 458.654)
    # T_BS inversion: q_BS is the conjugated rotation (asl_readers.cpp:32)
    from msckf_mono_tpu.utils import quat
    import jax.numpy as jnp

    R_BS = cam.T_BS[:3, :3]
    R_q = np.asarray(quat.to_rotmat(jnp.asarray(cam.q_BS)))
    np.testing.assert_allclose(R_q, R_BS.T, atol=1e-12)
    img = cam.read_image(0)
    assert img.shape == (480, 752)


def test_read_imu(fixture_root):
    imu = asl.read_imu(os.path.join(fixture_root, "imu0"))
    assert imu.dT == 1.0 / 200
    assert imu.omega.shape == (100, 3)
    np.testing.assert_allclose(imu.omega[3, 0], 0.03)
    np.testing.assert_allclose(imu.acc[0], [0.1, -0.2, 9.81])


def test_read_ground_truth_conventions(fixture_root):
    gt = asl.read_ground_truth(os.path.join(fixture_root, "state_groundtruth_estimate0"))
    # identity orientation: v passes through, q inverted = identity
    np.testing.assert_allclose(gt.q[0], [1, 0, 0, 0], atol=1e-12)
    np.testing.assert_allclose(gt.v[0], [0.5, 0.1, 0.0], atol=1e-12)
    np.testing.assert_allclose(gt.b_g[0], [0.001, 0.002, 0.003])


def test_bucket_imu(fixture_root):
    imu = asl.read_imu(os.path.join(fixture_root, "imu0"))
    cam = asl.read_camera(os.path.join(fixture_root, "cam0"))
    packed = sync.bucket_imu(
        imu.timestamps, imu.omega, imu.acc, imu.dT, cam.timestamps, 12,
        start_ts=cam.timestamps[0] - 50_000_000,
    )
    # 10 imu samples per 50ms frame interval at 200Hz (the fixture's IMU
    # stream only covers the first ~5 frames)
    counts = (packed.dt > 0).sum(axis=1)
    assert counts.max() <= 12
    assert (counts[1:5] == 10).all()
    assert packed.dropped == 0
    # sample values land in the right buckets
    assert packed.omega[1, 0, 2] == 0.3
