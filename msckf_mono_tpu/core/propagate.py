"""IMU propagation.

TPU-native re-design of ``MSCKF::propagate`` (/root/reference/include/
msckf_mono/msckf.h:101-145) with the same math:

* continuous-time error-state Jacobians F (15x15) and G (15x12)
  (msckf.h:874-903), error-state ordering [θ, b_g, v, b_a, p];
* 6-stage fixed-coefficient RK quaternion integration, Euler v and
  previous-velocity p update (msckf.h:1425-1467 — note p uses the *previous*
  v, reproduced deliberately);
* Φ = expm(F·dt) via fixed-order Taylor (ops/expm.py) instead of Eigen Padé;
* observability-constrained Φ surgery (Hesch et al. OC-EKF, msckf.h:113-132);
* covariance propagation Φ(P₁₅+GQGᵀdt)Φᵀ with symmetrization, cross-covariance
  Φ·P[0:15,15:] (msckf.h:134-144), done in-place on the single dense P.

The whole step is a pure function of (state, reading); time is driven by
``lax.scan`` at the call site and filters batch with ``vmap``.
"""

from __future__ import annotations

import jax.numpy as jnp

from msckf_mono_tpu.core.types import FilterState, ImuState
from msckf_mono_tpu.ops.expm import expm_taylor
from msckf_mono_tpu.utils import quat
from msckf_mono_tpu.utils.config import MsckfConfig


def calc_F(imu: ImuState, omega, a):
    """Continuous-time error-state Jacobian (reference msckf.h:874-890)."""
    dtype = omega.dtype
    omega_hat = omega - imu.b_g
    a_hat = a - imu.b_a
    C_IG = quat.to_rotmat(imu.q_IG)
    eye3 = jnp.eye(3, dtype=dtype)

    F = jnp.zeros((15, 15), dtype)
    F = F.at[0:3, 0:3].set(-quat.skew(omega_hat))
    F = F.at[0:3, 3:6].set(-eye3)
    F = F.at[6:9, 0:3].set(-C_IG.T @ quat.skew(a_hat))
    F = F.at[6:9, 9:12].set(-C_IG.T)
    F = F.at[12:15, 6:9].set(eye3)
    return F


def calc_G(imu: ImuState, dtype):
    """Noise input Jacobian (reference msckf.h:892-903)."""
    C_IG = quat.to_rotmat(imu.q_IG)
    eye3 = jnp.eye(3, dtype=dtype)
    G = jnp.zeros((15, 12), dtype)
    G = G.at[0:3, 0:3].set(-eye3)
    G = G.at[3:6, 3:6].set(eye3)
    G = G.at[6:9, 6:9].set(-C_IG.T)
    G = G.at[9:12, 9:12].set(eye3)
    return G


def propagate_imu_state(imu: ImuState, omega, a, dt) -> ImuState:
    """State integration (reference msckf.h:1425-1467).

    p update intentionally uses the pre-update velocity (msckf.h:1465).
    """
    q_new = quat.integrate_rk5(imu.q_IG, omega - imu.b_g, dt)
    C_IG = quat.to_rotmat(imu.q_IG)
    v_new = imu.v_I_G + (C_IG.T @ (a - imu.b_a) + imu.g) * dt
    p_new = imu.p_I_G + imu.v_I_G * dt
    return imu.replace(q_IG=q_new, v_I_G=v_new, p_I_G=p_new)


def compute_phi(imu: ImuState, imu_prop: ImuState, F, dt):
    """Φ = expm(F·dt) with OC-EKF nullspace enforcement (msckf.h:111-132)."""
    Phi = expm_taylor(F * dt)

    R_kk_1 = quat.to_rotmat(imu.q_IG_null)
    Phi = Phi.at[0:3, 0:3].set(quat.to_rotmat(imu_prop.q_IG) @ R_kk_1.T)

    u = R_kk_1 @ imu.g
    s = u / jnp.dot(u, u)  # row vector uᵀ/(uᵀu)

    A1 = Phi[6:9, 0:3]
    w1 = quat.skew(imu.v_I_G_null - imu_prop.v_I_G) @ imu.g
    Phi = Phi.at[6:9, 0:3].set(A1 - jnp.outer(A1 @ u - w1, s))

    A2 = Phi[12:15, 0:3]
    tmp = dt * imu.v_I_G_null + imu.p_I_G_null - imu_prop.p_I_G
    w2 = quat.skew(tmp) @ imu.g
    Phi = Phi.at[12:15, 0:3].set(A2 - jnp.outer(A2 @ u - w2, s))
    return Phi


def propagate(state: FilterState, omega, a, dt, config: MsckfConfig) -> FilterState:
    """One IMU sample. omega/a: (3,), dt: scalar."""
    dtype = state.P.dtype
    omega = jnp.asarray(omega, dtype)
    a = jnp.asarray(a, dtype)
    dt = jnp.asarray(dt, dtype)

    imu = state.imu
    F = calc_F(imu, omega, a)
    G = calc_G(imu, dtype)
    imu_prop = propagate_imu_state(imu, omega, a, dt)
    Phi = compute_phi(imu, imu_prop, F, dt)

    Q = jnp.diag(jnp.asarray(config.q_imu_diag(), dtype))
    P = state.P
    P00 = P[0:15, 0:15]
    P00_prop = Phi @ (P00 + G @ Q @ G.T * dt) @ Phi.T
    P00_prop = 0.5 * (P00_prop + P00_prop.T)

    P0c = Phi @ P[0:15, 15:]
    P = P.at[0:15, 0:15].set(P00_prop)
    P = P.at[0:15, 15:].set(P0c)
    P = P.at[15:, 0:15].set(P0c.T)

    imu_new = imu_prop.replace(
        q_IG_null=imu_prop.q_IG, v_I_G_null=imu_prop.v_I_G, p_I_G_null=imu_prop.p_I_G
    )
    return state.replace(imu=imu_new, P=P)
