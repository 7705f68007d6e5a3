"""Monte-Carlo fleet construction: perturbed initial states.

The batched-filter axis (BASELINE.md config 2/3/5) is fed by perturbing the
initial IMU state and biases; each perturbation is an independent filter
instance sharing the same sensor stream.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from msckf_mono_tpu.core.types import FilterState, ImuState, init_filter_state
from msckf_mono_tpu.utils import quat
from msckf_mono_tpu.utils.config import MsckfConfig


def perturb_imu_state(
    imu: ImuState,
    key,
    n: int,
    sigma_p: float = 0.0,
    sigma_v: float = 0.05,
    sigma_theta: float = 0.005,
    sigma_bg: float = 1e-3,
    sigma_ba: float = 1e-2,
) -> ImuState:
    """Batch of n perturbed copies of ``imu`` (leading axis n)."""
    kp, kv, kt, kg, ka = jax.random.split(key, 5)
    dtype = imu.p_I_G.dtype

    def b(x):
        return jnp.broadcast_to(x, (n,) + x.shape)

    dp = jax.random.normal(kp, (n, 3), dtype) * sigma_p
    dv = jax.random.normal(kv, (n, 3), dtype) * sigma_v
    dth = jax.random.normal(kt, (n, 3), dtype) * sigma_theta
    dbg = jax.random.normal(kg, (n, 3), dtype) * sigma_bg
    dba = jax.random.normal(ka, (n, 3), dtype) * sigma_ba

    dq = quat.build_update_quat(dth)
    q = quat.mul(dq, b(imu.q_IG))
    return ImuState(
        q_IG=q,
        b_g=b(imu.b_g) + dbg,
        v_I_G=b(imu.v_I_G) + dv,
        b_a=b(imu.b_a) + dba,
        p_I_G=b(imu.p_I_G) + dp,
        g=b(imu.g),
        q_IG_null=q,
        v_I_G_null=b(imu.v_I_G) + dv,
        p_I_G_null=b(imu.p_I_G) + dp,
    )


def make_fleet(
    config: MsckfConfig, imu: ImuState, n: int, key=None, dtype=jnp.float32, **sigmas
) -> FilterState:
    """n independent filter instances with perturbed inits."""
    base = init_filter_state(config, imu, dtype=dtype)
    if key is None:
        key = jax.random.PRNGKey(0)
    imu_batch = perturb_imu_state(imu, key, n, **sigmas)
    batch = jax.tree_util.tree_map(lambda x: jnp.broadcast_to(x, (n,) + x.shape).copy(), base)
    return batch.replace(imu=imu_batch)


def broadcast_frames(frames, n: int):
    """Share one (T, ...) frame stack across n filters -> (T, n, ...)."""
    return jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x[:, None, ...], (x.shape[0], n) + x.shape[1:]),
        frames,
    )


def make_grid_fleet(
    config: MsckfConfig,
    imu: ImuState,
    n: int,
    key=None,
    dtype=jnp.float32,
    q_imu_scale=None,
    meas_sigma_px=None,
    **sigmas,
):
    """Fleet spanning a NOISE-PARAMETER grid (BASELINE config 5: filters x
    calib/noise grid) on top of the Monte-Carlo init perturbations.

    Noise parameters live in the STATE (FilterState.q_imu_diag /
    .meas_sigma2), so each filter in the vmapped batch integrates and updates
    with its own values — a parameter sweep runs as ONE compiled program.

    q_imu_scale: (n,) multiplies the config's Q_imu diagonal per filter.
    meas_sigma_px: (n,) per-filter feature-noise sigma in PIXELS (converted
    via the config's (px / f_u)^2 derivation, ros_interface.cpp:313-314).
    """
    fleet = make_fleet(config, imu, n, key=key, dtype=dtype, **sigmas)
    if q_imu_scale is not None:
        scale = jnp.asarray(q_imu_scale, dtype)[:, None]
        fleet = fleet.replace(q_imu_diag=fleet.q_imu_diag * scale)
    if meas_sigma_px is not None:
        s2 = (jnp.asarray(meas_sigma_px, dtype) / config.camera.f_u) ** 2
        fleet = fleet.replace(meas_sigma2=s2)
    return fleet
