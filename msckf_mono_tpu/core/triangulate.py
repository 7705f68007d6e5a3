"""Feature triangulation: motion gate + Gauss-Newton/LM in inverse depth.

Re-design of ``checkMotion`` / ``generateInitialGuess`` / ``initializePosition``
/ ``cost`` / ``jacobian`` (/root/reference/include/msckf_mono/msckf.h:980-1323)
as fixed-iteration, masked, batch-first jnp code:

* observations arrive as per-window-slot arrays with masks; "first/last
  observation" become argmax-style gathers;
* the LM do-while loops (10 outer x 10 inner, msckf.h:1179-1248) become
  ``lax.fori_loop`` with the same accept/reject lambda schedule and the outer
  early-exit (delta_norm <= 5e-7) expressed as a carried done-flag;
* Huber weighting (eps=0.01) and the validity rules (cheirality in every
  observing view + normalized cost threshold, msckf.h:1257-1276) are identical.

Everything is per-track; callers vmap over the staged-track axis.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from msckf_mono_tpu.ops.linalg import bmm_small, bmv, solve3x3
from msckf_mono_tpu.utils import quat


def first_valid_index(mask):
    return jnp.argmax(mask)


def last_valid_index(mask):
    n = mask.shape[0]
    return n - 1 - jnp.argmax(mask[::-1])


def check_motion(obs, obs_mask, q_CG, p_C_G, translation_threshold):
    """Parallax gate (reference msckf.h:980-1025).

    obs: (N,2) per-slot observations, obs_mask: (N,), window pose arrays (N,·).
    Returns bool.
    """
    i0 = first_valid_index(obs_mask)
    first_obs = obs[i0]
    # first_cam_pose.linear() = R(q)ᵀ (cam->world)
    R0_T = quat.to_rotmat(q_CG[i0]).T
    d = jnp.concatenate([first_obs, jnp.ones((1,), obs.dtype)])
    d = d / jnp.linalg.norm(d)
    feature_dir = R0_T @ d

    t = p_C_G - p_C_G[i0][None, :]                       # (N,3)
    parallel = t @ feature_dir                            # (N,)
    ortho = t - parallel[:, None] * feature_dir[None, :]  # (N,3)
    ortho_norm = jnp.linalg.norm(ortho, axis=-1)
    valid_other = obs_mask & (jnp.arange(obs_mask.shape[0]) != i0)
    max_ortho = jnp.max(jnp.where(valid_other, ortho_norm, 0.0))

    count = jnp.sum(obs_mask)
    return (count >= 2) & (max_ortho > translation_threshold)


def _relative_poses(obs_mask, q_CG, p_C_G):
    """World->slot poses composed with first-slot cam->world: T_c0_ci.

    Returns A (N,3,3), t (N,3) with x_ci = A_i x_c0 + t_i, plus (A0,t0) =
    T_c0_w (cam0->world) for mapping the solution back (msckf.h:1154-1168).
    """
    i0 = first_valid_index(obs_mask)
    # cam->world per slot: linear R(q)ᵀ, translation p
    R_cw = jnp.swapaxes(quat.to_rotmat(q_CG), -1, -2)  # (N,3,3)
    A0, t0 = R_cw[i0], p_C_G[i0]
    # T_i⁻¹ ∘ T_0: A = R_cw_iᵀ A0, t = R_cw_iᵀ (t0 - p_i)
    A = bmm_small(jnp.swapaxes(R_cw, -1, -2), jnp.broadcast_to(A0, R_cw.shape))
    t = bmv(jnp.swapaxes(R_cw, -1, -2), t0[None, :] - p_C_G)
    return A, t, A0, t0


def _initial_guess(A_last, t_last, z_first, z_last):
    """Two-view linear depth init (reference msckf.h:1126-1145)."""
    m = A_last @ jnp.concatenate([z_first, jnp.ones((1,), z_first.dtype)])
    a = jnp.stack([m[0] - z_last[0] * m[2], m[1] - z_last[1] * m[2]])
    b = jnp.stack(
        [z_last[0] * t_last[2] - t_last[0], z_last[1] * t_last[2] - t_last[1]]
    )
    depth = jnp.dot(a, b) / jnp.maximum(jnp.dot(a, a), 1e-20)
    return jnp.array([z_first[0] * depth, z_first[1] * depth, depth])


def _total_cost(A, t, obs, obs_mask, x):
    """Masked sum of squared reprojection residuals (msckf.h:1027-1047)."""
    h = bmv(A, jnp.stack([x[0], x[1], jnp.ones_like(x[0])])) + x[2] * t
    z_hat = h[:, 0:2] / h[:, 2:3]
    e = jnp.sum((z_hat - obs) ** 2, axis=-1)
    return jnp.sum(jnp.where(obs_mask, e, 0.0))


def _total_cost_multi(A, t, obs, obs_mask, X):
    """Costs for K candidate solutions X (K, 3) in one fused pass.

    Evaluating the LM lambda-trial candidates one-vmapped-at-a-time made XLA
    re-read A/t per candidate as a convolution fusion (round-3 trace: the
    single hottest triangulation op); one broadcast pass over (N, 3, K)
    keeps it a loop fusion with A read once.
    """
    # Unrolled 3-term contraction: a jnp.sum over a broadcast (N, 3, 3, K)
    # intermediate materializes it (round-3 trace: the hottest triangulation
    # op at batch 1024); three fused multiply-adds touch only (N, 3, K).
    h = (
        A[:, :, 0, None] * X[None, None, :, 0]
        + A[:, :, 1, None] * X[None, None, :, 1]
        + A[:, :, 2, None]
        + t[:, :, None] * X[None, None, :, 2]
    )  # (N, 3, K)
    z_hat = h[:, 0:2, :] / h[:, 2:3, :]
    e = jnp.sum((z_hat - obs[:, :, None]) ** 2, axis=1)                # (N, K)
    return jnp.sum(jnp.where(obs_mask[:, None], e, 0.0), axis=0)       # (K,)


def _accumulate_normal_eqs(A, t, obs, obs_mask, x):
    """Masked Huber-weighted JᵀJ, Jᵀr accumulation (msckf.h:1201-1216, 1287-1323)."""
    dtype = x.dtype
    h = bmv(A, jnp.stack([x[0], x[1], jnp.ones_like(x[0])])) + x[2] * t
    h1, h2, h3 = h[:, 0], h[:, 1], h[:, 2]

    # W = [A[:, :, 0:2], t]  (3x3 per obs); J rows from quotient rule.
    W = jnp.concatenate([A[:, :, 0:2], t[:, :, None]], axis=-1)  # (N,3,3)
    J0 = W[:, 0, :] / h3[:, None] - (h1 / (h3 * h3))[:, None] * W[:, 2, :]
    J1 = W[:, 1, :] / h3[:, None] - (h2 / (h3 * h3))[:, None] * W[:, 2, :]
    J = jnp.stack([J0, J1], axis=1)  # (N,2,3)

    z_hat = jnp.stack([h1 / h3, h2 / h3], axis=-1)
    r = z_hat - obs  # (N,2)

    e = jnp.linalg.norm(r, axis=-1)
    huber_eps = jnp.asarray(0.01, dtype)
    w = jnp.where(e <= huber_eps, 1.0, huber_eps / (2.0 * jnp.maximum(e, 1e-20)))
    w2 = jnp.where(w == 1.0, 1.0, w * w)  # reference applies w² only when w != 1

    m = obs_mask.astype(dtype) * w2
    JtJ = jnp.einsum("n,nki,nkj->ij", m, J, J)
    Jtr = jnp.einsum("n,nki,nk->i", m, J, r)
    return JtJ, Jtr


def initialize_position(obs, obs_mask, q_CG, p_C_G, max_gn_cost_norm,
                        n_iters: int = 11, n_trials: int = 11):
    """LM triangulation. Returns (p_f_G (3,), is_valid bool).

    Reference msckf.h:1147-1285 with the same constants: damping 1e-3, lambda
    in [1e-10, 1e12], 10x10 iteration caps, precision 5e-7.

    ``n_iters``/``n_trials`` shrink the outer-iteration / lambda-trial
    schedule for serving configs (defaults = the reference's full schedule).
    A truncated trial sweep that finds no cost reduction behaves exactly like
    the reference's full failed sweep (solution unchanged, lambda escalated
    from the last executed trial); a truncated outer loop stops refining
    early. Both only matter for tracks that hadn't converged — measured
    convergence on the bench world is 2-4 outer iterations with trial 0-1
    accepted (the serving values are A/B'd by the bench's accuracy gate).
    """
    dtype = obs.dtype
    A, t, A0, t0 = _relative_poses(obs_mask, q_CG, p_C_G)
    i0 = first_valid_index(obs_mask)
    i1 = last_valid_index(obs_mask)

    p0 = _initial_guess(A[i1], t[i1], obs[i0], obs[i1])
    solution = jnp.array(
        [p0[0] / p0[2], p0[1] / p0[2], 1.0 / p0[2]], dtype=dtype
    )
    total_cost = _total_cost(A, t, obs, obs_mask, solution)

    def outer_body(_, carry):
        solution, total_cost, lam, done = carry
        JtJ, Jtr = _accumulate_normal_eqs(A, t, obs, obs_mask, solution)

        # The reference's inner do-while (msckf.h:1217-1248) tries lambdas
        # lam·10⁰, lam·10¹, … and exits at the FIRST cost reduction (reduced
        # flag), clamping each trial to [1e-10, 1e12]. That trial schedule is
        # data-independent, so all 11 candidates can be evaluated in parallel
        # — one broadcast 3×3 solve + one batched cost sweep — instead of 11
        # sequential solve/cost rounds. Identical accept/lambda semantics,
        # ~10× less sequential depth (this runs per-track per-frame inside
        # the scanned step: the hottest loop in the filter).
        ks = jnp.arange(n_trials)
        lams = jnp.minimum(lam * (10.0 ** ks.astype(dtype)), 1e12)       # (K,)
        dampers = lams[:, None, None] * jnp.eye(3, dtype=dtype)          # (K,3,3)
        deltas = solve3x3(JtJ[None] + dampers, Jtr[None])                # (K,3)
        cands = solution[None, :] - deltas                               # (K,3)
        costs = _total_cost_multi(A, t, obs, obs_mask, cands)
        reduces = costs < total_cost                                      # (K,)
        any_red = jnp.any(reduces)
        first = jnp.argmax(reduces)                                       # first accepted trial
        # If no trial reduces the cost, the do-while runs all K iterations
        # and leaves solution/cost unchanged; lam ends at the last trial's
        # clamp ×10 (clamped), and delta_norm is that of the LAST executed
        # trial.
        kacc = jnp.where(any_red, first, n_trials - 1)
        solution_n = jnp.where(any_red, cands[kacc], solution)
        cost_n = jnp.where(any_red, costs[kacc], total_cost)
        lam_n = jnp.where(
            any_red,
            jnp.maximum(lams[kacc] / 10.0, 1e-10),
            jnp.minimum(lams[n_trials - 1] * 10.0, 1e12),
        )
        delta_norm = jnp.linalg.norm(deltas[kacc])

        solution = jnp.where(done, solution, solution_n)
        total_cost = jnp.where(done, total_cost, cost_n)
        lam = jnp.where(done, lam, lam_n)
        done = done | (delta_norm <= 5e-7)
        return solution, total_cost, lam, done

    # Initial lam/done derive from total_cost (instead of fresh constants) so
    # their "varying" axis status matches the loop outputs under shard_map.
    lam0 = jnp.full_like(total_cost, 1e-3)
    done0 = total_cost < 0.0  # always False: cost is a sum of squares
    solution, total_cost, _, _ = jax.lax.fori_loop(
        0, n_iters, outer_body, (solution, total_cost, lam0, done0)
    )

    final_position = jnp.array(
        [solution[0] / solution[2], solution[1] / solution[2], 1.0 / solution[2]],
        dtype=dtype,
    )

    # Cheirality in every observing view (msckf.h:1257-1265).
    pos_in_view = bmv(A, jnp.broadcast_to(final_position, t.shape)) + t
    cheirality = jnp.all(jnp.where(obs_mask, pos_in_view[:, 2] > 0, True))

    m = jnp.sum(obs_mask)
    normalized_cost = total_cost / (2.0 * jnp.maximum(m, 1) ** 2)
    is_valid = cheirality & (normalized_cost <= max_gn_cost_norm) & (m >= 2)

    p_f_G = A0 @ final_position + t0
    return p_f_G, is_valid
