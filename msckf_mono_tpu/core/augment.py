"""Camera-state augmentation.

Re-design of ``MSCKF::augmentState`` (/root/reference/include/msckf_mono/
msckf.h:148-212): compute the camera pose from the IMU pose + extrinsics,
append it to the window, and augment the covariance with the 6-row Jacobian J
(msckf.h:180-184). With the single dense fixed-shape P, augmentation is a
dynamic-slice write of [J·P ; (J·P)ᵀ ; J·P₁₅Jᵀ] at block index `count` —
no resize, no block re-splitting.

If the window is physically full (all ``num_slots`` used — the reference's
window can transiently exceed ``max_cam_states`` when long tracks pin old
states), the oldest slot is dropped without an update (equivalent to
marginalizing it with no observations) and a diagnostics counter records it.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from msckf_mono_tpu.core.types import FilterState
from msckf_mono_tpu.utils import quat
from msckf_mono_tpu.utils.config import MsckfConfig


def augment_state(state: FilterState, state_id, time, config: MsckfConfig) -> FilterState:
    dtype = state.P.dtype
    N = config.shapes.num_slots

    # Make room if physically full (rare; counted). Dropping the OLDEST slot
    # is the fixed permutation "roll left by one", so the maybe-drop is a
    # static roll + select — under vmap a lax.cond runs both branches anyway,
    # and the general compact_slots path costs a data-dependent permutation of
    # P where this costs two static slices (round-3 microbench).
    full = state.window.count >= N

    def rolled(x, axis):
        return jnp.roll(x, -1, axis=axis)

    w = state.window
    window_r = w.replace(
        q_CG=rolled(w.q_CG, 0), p_C_G=rolled(w.p_C_G, 0), time=rolled(w.time, 0),
        state_id=jnp.where(jnp.arange(N) < N - 1, rolled(w.state_id, 0), -1),
        # only selected when the window is full, so survivors are 0..N-2
        valid=w.valid & (jnp.arange(N) < N - 1),
    )
    t = state.tracks
    mask_r = rolled(t.obs_mask, 1) & (jnp.arange(N) < N - 1)[None, :]
    tracks_r = t.replace(obs=rolled(t.obs, 1) * mask_r[:, :, None], obs_mask=mask_r)
    # P: shift the camera block up-left by 6; zero the freed last 6 rows/cols.
    P_r = jnp.zeros_like(state.P)
    P_r = P_r.at[:15, :15].set(state.P[:15, :15])
    P_r = P_r.at[:15, 15 : 15 + 6 * (N - 1)].set(state.P[:15, 21:])
    P_r = P_r.at[15 : 15 + 6 * (N - 1), :15].set(state.P[21:, :15])
    P_r = P_r.at[15 : 15 + 6 * (N - 1), 15 : 15 + 6 * (N - 1)].set(state.P[21:, 21:])

    state = jax.tree_util.tree_map(
        lambda a, b: jnp.where(jnp.reshape(full, (1,) * a.ndim), a, b),
        state.replace(
            window=window_r,
            tracks=tracks_r,
            P=P_r,
            diag=state.diag.replace(window_overflow=state.diag.window_overflow + 1),
        ),
        state,
    )

    imu = state.imu
    q_CI = jnp.asarray(config.camera.q_CI, dtype)
    p_C_I = jnp.asarray(config.camera.p_C_I, dtype)

    q_CG = quat.normalize(quat.mul(q_CI, imu.q_IG))
    p_C_G = imu.p_I_G + quat.rotate(quat.inverse(imu.q_IG), p_C_I)

    k = state.window.count  # slot for the new state
    window = state.window
    window = window.replace(
        q_CG=window.q_CG.at[k].set(q_CG),
        p_C_G=window.p_C_G.at[k].set(p_C_G),
        time=window.time.at[k].set(jnp.asarray(time, dtype)),
        state_id=window.state_id.at[k].set(jnp.asarray(state_id, jnp.int32)),
        valid=window.valid.at[k].set(True),
    )

    # J: 6 rows, nonzero only in the 15 IMU columns (msckf.h:180-184).
    J15 = jnp.zeros((6, 15), dtype)
    J15 = J15.at[0:3, 0:3].set(quat.to_rotmat(q_CI))
    J15 = J15.at[3:6, 0:3].set(quat.skew(quat.rotate(quat.inverse(imu.q_IG), p_C_I)))
    J15 = J15.at[3:6, 12:15].set(jnp.eye(3, dtype=dtype))

    P = state.P
    B = J15 @ P[0:15, :]          # (6, D) = J · P (J is zero beyond col 15)
    corner = B[:, 0:15] @ J15.T   # (6, 6)

    r = 15 + 6 * k
    P = jax.lax.dynamic_update_slice(P, B, (r, jnp.zeros_like(r)))
    P = jax.lax.dynamic_update_slice(P, B.T, (jnp.zeros_like(r), r))
    P = jax.lax.dynamic_update_slice(P, corner, (r, r))
    P = 0.5 * (P + P.T)  # msckf.h:197

    return state.replace(window=window, P=P)
