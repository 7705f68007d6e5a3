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

import jax
import jax.numpy as jnp

from msckf_mono_tpu.core.types import FilterState, ImuState
from msckf_mono_tpu.ops.expm import expm_taylor
from msckf_mono_tpu.utils import quat
from msckf_mono_tpu.utils.config import MsckfConfig


def calc_F(imu: ImuState, omega, a):
    """Continuous-time error-state Jacobian (reference msckf.h:874-890).

    Assembled as block concatenations — sequential ``.at[].set`` writes on a
    zeros base lowered to chains of dynamic-update-slices on TPU (~3% of the
    round-3 frame step across the 10 per-frame samples).
    """
    dtype = omega.dtype
    omega_hat = omega - imu.b_g
    a_hat = a - imu.b_a
    C_IG = quat.to_rotmat(imu.q_IG)
    eye3 = jnp.eye(3, dtype=dtype)
    z3 = jnp.zeros((3, 3), dtype)

    def row(blocks):
        return jnp.concatenate(blocks, axis=1)

    return jnp.concatenate(
        [
            row([-quat.skew(omega_hat), -eye3, z3, z3, z3]),
            row([z3, z3, z3, z3, z3]),
            row([-C_IG.T @ quat.skew(a_hat), z3, z3, -C_IG.T, z3]),
            row([z3, z3, z3, z3, z3]),
            row([z3, z3, eye3, z3, z3]),
        ],
        axis=0,
    )


def calc_G(imu: ImuState, dtype):
    """Noise input Jacobian (reference msckf.h:892-903)."""
    C_IG = quat.to_rotmat(imu.q_IG)
    eye3 = jnp.eye(3, dtype=dtype)
    z3 = jnp.zeros((3, 3), dtype)

    def row(blocks):
        return jnp.concatenate(blocks, axis=1)

    return jnp.concatenate(
        [
            row([-eye3, z3, z3, z3]),
            row([z3, eye3, z3, z3]),
            row([z3, z3, -C_IG.T, z3]),
            row([z3, z3, z3, eye3]),
            row([z3, z3, z3, z3]),
        ],
        axis=0,
    )


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


def propagate_block(state: FilterState, omegas, accs, dts, config: MsckfConfig) -> FilterState:
    """All K IMU samples of one frame in a single composed covariance update.

    Identical math to scanning :func:`propagate` K times — the per-sample
    recurrence P_{k+1} = Φ_k (P_k + G_k Q G_kᵀ dt_k) Φ_kᵀ composes exactly to

        P_K  = S_0 P_0 S_0ᵀ + Σ_k S_k (G_k Q G_kᵀ dt_k) S_kᵀ,
        S_k  = Φ_{K-1} ··· Φ_k,

    so only the cheap quaternion/state integration stays sequential; the K
    matrix exponentials, OC-EKF surgeries, and noise accumulations run
    batched over k and the (15+6N)-wide covariance is touched once instead
    of K times. This is the TPU answer to the reference's per-sample Eigen
    ``F.exp()`` loop (msckf.h:101-145): ~10× fewer sequential small ops per
    frame, one instead of ten P-sized HBM round-trips.

    omegas/accs: (K,3); dts: (K,), 0 for padded samples (identity steps).
    """
    dtype = state.P.dtype
    omegas = jnp.asarray(omegas, dtype)
    accs = jnp.asarray(accs, dtype)
    dts = jnp.asarray(dts, dtype)
    K = dts.shape[0]
    imu0 = state.imu

    # 1) sequential state integration (small (4,)/(3,) ops only)
    def body(imu, inp):
        omega, a, dt = inp
        imu_prop = propagate_imu_state(imu, omega, a, dt)
        return imu_prop, imu

    imuN, imu_pre = jax.lax.scan(body, imu0, (omegas, accs, dts))
    # post-step state at k  == pre-step state at k+1; last one is imuN
    imu_post = jax.tree_util.tree_map(
        lambda pre, last: jnp.concatenate([pre[1:], last[None]]), imu_pre, imuN
    )

    # OC-EKF null linearization points: propagate() sets null <- propagated
    # at the end of every step, so step k>=1 sees null == its pre-step state;
    # only step 0 uses the stored nulls (they survive EKF corrections).
    def stack_null(null0, pre):
        return jnp.concatenate([jnp.asarray(null0, dtype)[None], pre[1:]])

    q_null = stack_null(imu0.q_IG_null, imu_pre.q_IG)
    v_null = stack_null(imu0.v_I_G_null, imu_pre.v_I_G)
    p_null = stack_null(imu0.p_I_G_null, imu_pre.p_I_G)

    # 2) batched per-sample Φ with the OC surgery (msckf.h:111-132)
    F = jax.vmap(calc_F)(imu_pre, omegas, accs)                      # (K,15,15)
    Phi = expm_taylor(F * dts[:, None, None])

    R_kk_1 = quat.to_rotmat(q_null)                                   # (K,3,3)
    R_prop = quat.to_rotmat(imu_post.q_IG)
    Phi = Phi.at[:, 0:3, 0:3].set(jnp.einsum("kab,kcb->kac", R_prop, R_kk_1))

    g = imu0.g
    u = jnp.einsum("kab,b->ka", R_kk_1, g)                            # (K,3)
    s = u / jnp.sum(u * u, axis=-1, keepdims=True)                    # (K,3)

    A1 = Phi[:, 6:9, 0:3]
    w1 = jnp.einsum("kab,b->ka", quat.skew(v_null - imu_post.v_I_G), g)
    lhs1 = jnp.einsum("kab,kb->ka", A1, u) - w1
    Phi = Phi.at[:, 6:9, 0:3].set(A1 - lhs1[:, :, None] * s[:, None, :])

    A2 = Phi[:, 12:15, 0:3]
    tmp = dts[:, None] * v_null + p_null - imu_post.p_I_G
    w2 = jnp.einsum("kab,b->ka", quat.skew(tmp), g)
    lhs2 = jnp.einsum("kab,kb->ka", A2, u) - w2
    Phi = Phi.at[:, 12:15, 0:3].set(A2 - lhs2[:, :, None] * s[:, None, :])

    # 3) suffix transition products S_k = Φ_{K-1}···Φ_k
    def suffix_body(S_next, Phi_k):
        S_k = S_next @ Phi_k
        return S_k, S_k

    # eye derives from Phi (not a fresh constant) so the carry's "varying"
    # axis status matches the loop output under shard_map.
    _, S_rev = jax.lax.scan(
        suffix_body, jnp.eye(15, dtype=dtype) + 0.0 * Phi[0], Phi[::-1]
    )
    S = S_rev[::-1]                                                   # (K,15,15)
    S0 = S[0]

    # 4) one composed covariance update
    Q = jnp.diag(state.q_imu_diag.astype(dtype))  # per-filter noise (grid fleets)
    G = jax.vmap(lambda i: calc_G(i, dtype))(imu_pre)                 # (K,15,12)
    SG = jnp.einsum("kab,kbc->kac", S, G)                             # (K,15,12)
    noise = jnp.einsum("k,kac,cd,kbd->ab", dts, SG, Q, SG)

    P = state.P
    P00_prop = S0 @ P[0:15, 0:15] @ S0.T + noise
    P00_prop = 0.5 * (P00_prop + P00_prop.T)
    P0c = S0 @ P[0:15, 15:]
    P = P.at[0:15, 0:15].set(P00_prop)
    P = P.at[0:15, 15:].set(P0c)
    P = P.at[15:, 0:15].set(P0c.T)

    imu_new = imuN.replace(
        q_IG_null=imuN.q_IG, v_I_G_null=imuN.v_I_G, p_I_G_null=imuN.p_I_G
    )
    return state.replace(imu=imu_new, P=P)


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

    Q = jnp.diag(state.q_imu_diag.astype(dtype))  # per-filter noise (grid fleets)
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
