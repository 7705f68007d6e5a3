"""Filter initialization variants.

Mirrors the two reference entry paths:
* ground-truth seeded init (/root/reference/datasets/asl_msckf.cpp:151-159);
* standstill self-calibration from averaged IMU readings
  (/root/reference/datasets/asl_msckf_no_ground_truth.cpp:141-173 and
  src/ros_interface.cpp:157-206): b_g = mean gyro, q_IG aligns -g with the
  mean accel, b_a = q_IG·g + mean accel, p = v = 0.
"""

from __future__ import annotations

import jax.numpy as jnp

from msckf_mono_tpu.core.types import ImuState, init_imu_state
from msckf_mono_tpu.utils import quat


def standstill_init(omega, acc, valid=None, g=(0.0, 0.0, -9.81), dtype=jnp.float32) -> ImuState:
    """omega/acc: (K, 3) readings from the standstill window; valid: (K,)."""
    omega = jnp.asarray(omega, dtype)
    acc = jnp.asarray(acc, dtype)
    if valid is None:
        valid = jnp.ones(omega.shape[0], bool)
    w = valid.astype(dtype)
    n = jnp.maximum(jnp.sum(w), 1.0)
    gyro_mean = jnp.sum(omega * w[:, None], axis=0) / n
    accel_mean = jnp.sum(acc * w[:, None], axis=0) / n

    g_vec = jnp.asarray(g, dtype)
    b_g = gyro_mean
    q_IG = quat.from_two_vectors(-g_vec, accel_mean)
    b_a = quat.rotate(q_IG, g_vec) + accel_mean
    return init_imu_state(q_IG=q_IG, b_g=b_g, b_a=b_a, g=g_vec, dtype=dtype)


def ground_truth_init(p_I_G, q_IG, v_I_G, b_g, b_a, g=(0.0, 0.0, -9.81), dtype=jnp.float32) -> ImuState:
    return init_imu_state(
        q_IG=q_IG, b_g=b_g, v_I_G=v_I_G, b_a=b_a, p_I_G=p_I_G, g=jnp.asarray(g, dtype), dtype=dtype
    )
