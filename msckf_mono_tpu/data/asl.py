"""EuRoC / ASL dataset readers.

Re-design of the ``asl_dataset`` readers (/root/reference/include/datasets/
asl_readers.h, datasets/asl_readers.cpp) as host-side numpy parsers producing
packed arrays; images are decoded lazily via PIL.

Conventions reproduced from the reference:
* camera T_BS is inverted into (q_BS, p_BS) — q is the conjugated rotation
  (asl_readers.cpp:32-33), giving q_CI / p_C_I for the filter;
* ground truth converts to the filter frame: v <- q*v, q <- q^-1, with
  g = (0,0,-9.81) (asl_readers.cpp:331-337);
* IMU dT is fixed at 1/rate_hz (asl_readers.cpp:170-171).

The ``%YAML:1.0`` directive OpenCV requires (reference README.md:27-30) is
stripped before PyYAML parsing — no OpenCV dependency.
"""

from __future__ import annotations

import csv
import dataclasses
import os

import numpy as np
import yaml


def _load_yaml(path):
    with open(path) as f:
        text = f.read()
    lines = [ln for ln in text.splitlines() if not ln.startswith("%YAML")]
    # OpenCV writes "!!opencv-matrix" tags; neutralize them.
    text = "\n".join(lines).replace("!!opencv-matrix", "")
    return yaml.safe_load(text)


def _rotmat_to_quat_wxyz(R):
    from scipy.spatial.transform import Rotation

    q = Rotation.from_matrix(R).as_quat()  # xyzw
    return np.array([q[3], q[0], q[1], q[2]])


def _quat_conj(q):
    return q * np.array([1.0, -1.0, -1.0, -1.0])


@dataclasses.dataclass
class AslCamera:
    timestamps: np.ndarray      # (n,) int64 ns
    image_files: list           # n paths
    T_BS: np.ndarray            # (4,4)
    q_BS: np.ndarray            # (4,) wxyz  — INVERTED rotation (q_CI)
    p_BS: np.ndarray            # (3,)       — p_C_I
    K: np.ndarray               # (3,3)
    distortion_model: str
    distortion_coeffs: np.ndarray
    width: int
    height: int
    rate_hz: float

    @property
    def dT(self):
        return 1.0 / self.rate_hz

    def read_image(self, i: int) -> np.ndarray:
        from msckf_mono_tpu.data import native_loader

        return native_loader.imread_gray(self.image_files[i]).astype(np.float32)

    def prefetcher(self, n_threads: int = 4, lookahead: int = 16):
        """Threaded decode-ahead image pipeline (native/loader.cpp); decode
        overlaps with device execution. Falls back to sync PIL decode."""
        from msckf_mono_tpu.data import native_loader

        return native_loader.ImagePrefetcher(
            self.image_files, self.width, self.height,
            n_threads=n_threads, lookahead=lookahead,
        )


def read_camera(folder: str) -> AslCamera:
    cfg = _load_yaml(os.path.join(folder, "sensor.yaml"))
    T = np.asarray(cfg["T_BS"]["data"], float).reshape(
        cfg["T_BS"]["rows"], cfg["T_BS"]["cols"]
    )
    R_BS = T[:3, :3]
    q_BS = _quat_conj(_rotmat_to_quat_wxyz(R_BS))  # inverse (asl_readers.cpp:32)
    p_BS = T[:3, 3]

    fu, fv, cu, cv_ = cfg["intrinsics"]
    K = np.array([[fu, 0, cu], [0, fv, cv_], [0, 0, 1.0]])

    ts, files = [], []
    with open(os.path.join(folder, "data.csv")) as f:
        for row in csv.reader(f):
            if not row or row[0].startswith("#"):
                continue
            ts.append(int(row[0]))
            files.append(os.path.join(folder, "data", row[1].strip()))

    res = cfg["resolution"]
    return AslCamera(
        timestamps=np.asarray(ts, np.int64),
        image_files=files,
        T_BS=T,
        q_BS=q_BS,
        p_BS=p_BS,
        K=K,
        distortion_model=cfg.get("distortion_model", "radtan"),
        distortion_coeffs=np.asarray(cfg.get("distortion_coefficients", [0, 0, 0, 0]), float),
        width=int(res[0]),
        height=int(res[1]),
        rate_hz=float(cfg["rate_hz"]),
    )


@dataclasses.dataclass
class AslImu:
    timestamps: np.ndarray  # (n,) int64 ns
    omega: np.ndarray       # (n,3)
    acc: np.ndarray         # (n,3)
    dT: float
    gyroscope_noise_density: float
    gyroscope_random_walk: float
    accelerometer_noise_density: float
    accelerometer_random_walk: float


def read_imu(folder: str) -> AslImu:
    from msckf_mono_tpu.data import native_loader

    cfg = _load_yaml(os.path.join(folder, "sensor.yaml"))
    path = os.path.join(folder, "data.csv")
    vals = native_loader.parse_csv(path, 7)          # ts wx wy wz ax ay az
    ts = native_loader.parse_csv_i64_col(path, 0)    # exact int64 ns
    return AslImu(
        timestamps=ts,
        omega=vals[:, 1:4],
        acc=vals[:, 4:7],
        dT=1.0 / float(cfg["rate_hz"]),
        gyroscope_noise_density=float(cfg.get("gyroscope_noise_density", 0.0)),
        gyroscope_random_walk=float(cfg.get("gyroscope_random_walk", 0.0)),
        accelerometer_noise_density=float(cfg.get("accelerometer_noise_density", 0.0)),
        accelerometer_random_walk=float(cfg.get("accelerometer_random_walk", 0.0)),
    )


@dataclasses.dataclass
class AslGroundTruth:
    timestamps: np.ndarray  # (n,) int64 ns
    p: np.ndarray           # (n,3)
    q: np.ndarray           # (n,4) wxyz, ALREADY inverted to filter frame
    v: np.ndarray           # (n,3) rotated into the filter frame (q*v)
    b_g: np.ndarray         # (n,3)
    b_a: np.ndarray         # (n,3)


def read_ground_truth(folder: str) -> AslGroundTruth:
    from msckf_mono_tpu.data import native_loader

    path = os.path.join(folder, "data.csv")
    vals = native_loader.parse_csv(path, 17)
    ts = native_loader.parse_csv_i64_col(path, 0)
    ps = vals[:, 1:4]
    q = vals[:, 4:8]    # w,x,y,z
    v = vals[:, 8:11]
    bgs = vals[:, 11:14]
    bas = vals[:, 14:17]
    # filter convention: v <- q*v (rotate into IMU frame), q <- q^-1
    # (asl_readers.cpp:335-336)
    from scipy.spatial.transform import Rotation

    rot = Rotation.from_quat(np.roll(q, -1, axis=1))  # xyzw
    v_rot = rot.apply(v)  # Eigen q*v with the as-read quaternion, pre-inversion
    q_inv = np.concatenate([q[:, :1], -q[:, 1:]], axis=1)

    return AslGroundTruth(
        timestamps=ts,
        p=ps,
        q=q_inv,
        v=v_rot,
        b_g=bgs,
        b_a=bas,
    )


@dataclasses.dataclass
class AslSequence:
    imu: AslImu
    cam: AslCamera
    gt: AslGroundTruth | None


def read_sequence(root: str) -> AslSequence:
    """root = .../MH_03_medium/mav0"""
    gt_dir = os.path.join(root, "state_groundtruth_estimate0")
    return AslSequence(
        imu=read_imu(os.path.join(root, "imu0")),
        cam=read_camera(os.path.join(root, "cam0")),
        gt=read_ground_truth(gt_dir) if os.path.isdir(gt_dir) else None,
    )
