"""Measurement Jacobians, nullspace projection, gating, and the EKF update.

Re-design of ``calcResidual`` / ``calcMeasJacobian`` / ``gatingTest`` /
``measurementUpdate`` (/root/reference/include/msckf_mono/msckf.h:905-978,
1103-1124, 1325-1423) for fixed shapes and the MXU:

* Per-track observations are gathered in *compacted order* (valid slots first).
  Because Householder QR preserves exact zero rows, the complete-QR left-
  nullspace basis of the compacted H_f is block-diagonal: its first ``2m-3``
  columns carry all information and the remainder produce exactly-zero rows.
  That makes per-track projected rows contiguous, so they can be compacted
  into a fixed global row budget.
* The reference's Householder-QR "T_H" compression of the stacked Jacobian
  with dynamic nonzero-row dropping (msckf.h:1343-1366) becomes a fixed-shape
  reduced QR with zero-row *masking* (see :func:`compress_rows`) — identical
  update, static shapes.
* Measurement noise defaults to isotropic σ² = u_var_prime, matching the
  gating test exactly (msckf.h:1114) and the update to ~(u_var'/v_var'-1)
  relative error (u_var' and v_var' differ by <1% on EuRoC);
  ``FilterConfig.use_anisotropic_r`` enables the reference's exact projected
  R_o = blockdiag_tracks(A_jᵀ diag(u_var', v_var') A_j) as a low-rank
  σu²I + (σv²-σu²)·(VVᵀ ⊙ same-track) term (per-row track ids zero the
  cross-track products, matching the reference's per-track blocks).
* Joseph-form covariance correction + symmetrization (msckf.h:1394-1403).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from msckf_mono_tpu.core.types import FilterState, StagedTracks
from msckf_mono_tpu.core import triangulate
from msckf_mono_tpu.ops import psd_pallas
from msckf_mono_tpu.ops.linalg import bmm_small, bmv, null_project_3
from msckf_mono_tpu.utils import quat
from msckf_mono_tpu.utils.chi2 import chi2_gate_table
from msckf_mono_tpu.utils.config import MsckfConfig


def track_projected_rows(obs, obs_mask, p_f_G, window, g, config: MsckfConfig,
                         m_cap: int | None = None):
    """Nullspace-projected measurement rows for ONE track.

    Returns (H_o ((2M-3), D), r_o (2M-3,), rows_valid (2M-3,), V) with
    M = min(m_cap, N) (M = N when ``m_cap`` is None — the exact path).
    Mirrors msckf.h:905-978 including the per-observation observability
    constraint A - A·u(uᵀu)⁻¹uᵀ.

    ``m_cap`` bounds the number of observations carried into the row math:
    the valid-first sort means a track with m <= m_cap observations is EXACT
    (identical rows to the uncapped path); beyond that the newest-slot
    observations are dropped (callers count the lost rows in row_overflow).
    Measured rationale (tools/measure_row_stats.py, bench world 256x200):
    prune-path candidates have exactly 2 involved observations (1 row) at
    p99.9, yet paid the full (2N-3)=53-row buffer — the single largest block
    of the round-4 frame step (VERDICT r4 next-1).

    V is None unless ``filter.use_anisotropic_r``: then it is the ((2M-3), M)
    projection of the v-row indicator columns, giving the track's exact
    projected noise R_o = A_jᵀ diag(u_var', v_var') A_j (msckf.h:411-431) as
    σu²·I + (σv²-σu²)·V Vᵀ (the projection rows are orthonormal; reflector
    support analysis keeps masked-row parity exact once V's invalid rows are
    zeroed).
    """
    dtype = obs.dtype
    N = obs_mask.shape[0]
    M = N if m_cap is None else max(2, min(int(m_cap), N))
    D = config.shapes.state_dim

    # Refine validity BEFORE sorting: observations with near-zero depth produce
    # unbounded Jacobians that inflate S in the gating test enough to sneak
    # garbage through (gamma -> 0); drop them like a lost observation. The
    # reference has no such guard but also dies less gracefully there. The
    # sort-by-validity keeps the zero rows of H_f contiguous at the bottom,
    # which the QR-nullspace row compaction relies on.
    depth_all = bmv(quat.to_rotmat(window.q_CG), p_f_G[None, :] - window.p_C_G)[:, 2]
    eff_mask = obs_mask & (depth_all > 1e-2)

    order = jnp.argsort(jnp.logical_not(eff_mask), stable=True)[:M]
    m = jnp.minimum(jnp.sum(eff_mask), M)
    valid = jnp.arange(M) < m

    # Sorted gathers as one-hot matmuls: per-track fancy-index gathers with
    # batched indices lower to per-element loops on TPU (round-3 trace: ~10%
    # of the frame step across q/p/z); the same one-hot also places the
    # 6-wide H blocks below. One-hot selection is exact at HIGHEST precision.
    onehot = (order[:, None] == jnp.arange(N)[None, :]).astype(dtype)  # (M,N)

    def sel(x):  # broadcast-sum one-hot selection: exact, fuses as VPU work
        return jnp.sum(onehot[:, :, None] * x[None, :, :], axis=1)

    q = sel(window.q_CG)
    p = sel(window.p_C_G)
    z = sel(obs)

    R = quat.to_rotmat(q)                                # (N,3,3)
    dp = p_f_G[None, :] - p                              # (N,3)
    p_f_C = bmv(R, dp)                                   # (N,3)
    X, Y, Z = p_f_C[:, 0], p_f_C[:, 1], jnp.where(valid, p_f_C[:, 2], 1.0)
    Z = jnp.where(jnp.abs(Z) > 1e-8, Z, 1.0)

    inv_z = 1.0 / Z
    J = jnp.stack(
        [
            jnp.stack([inv_z, jnp.zeros_like(inv_z), -X * inv_z * inv_z], axis=-1),
            jnp.stack([jnp.zeros_like(inv_z), inv_z, -Y * inv_z * inv_z], axis=-1),
        ],
        axis=1,
    )  # (N,2,3)

    A = jnp.concatenate(
        [bmm_small(J, quat.skew(p_f_C)), -bmm_small(J, R)], axis=-1
    )  # (N,2,6)

    u = jnp.concatenate(
        [bmv(R, jnp.broadcast_to(g, dp.shape)), bmv(quat.skew(dp), jnp.broadcast_to(g, dp.shape))],
        axis=-1,
    )  # (N,6)
    uu = jnp.sum(u * u, axis=-1, keepdims=True)          # (N,1)
    Au = bmv(A, u)                                        # (N,2)
    H_x6 = A - Au[:, :, None] * (u / jnp.maximum(uu, 1e-20))[:, None, :]  # (N,2,6)
    H_f = -H_x6[:, :, 3:6]                                # (N,2,3)

    r = z - jnp.stack([X * inv_z, Y * inv_z], axis=-1)    # (N,2)

    # Zero invalid observation rows (exact zeros are load-bearing for QR).
    H_x6 = H_x6 * valid[:, None, None]
    H_f = H_f * valid[:, None, None]
    r = r * valid[:, None]

    # Place the 6-wide blocks at their slot columns. H_x is a permuted block
    # diagonal (sorted obs n targets original slot order[n]), so a one-hot
    # broadcast-multiply materializes it as pure VPU work — a fancy-index
    # scatter here lowers to a slow TPU scatter op (measured in round 2).
    H_cam = (H_x6[:, :, None, :] * onehot[:, None, :, None]).reshape(2 * M, 6 * N)
    H_f_rows = H_f.reshape(2 * M, 3)
    r_rows = r.reshape(2 * M)

    # Left-nullspace projection via three explicit Householder reflectors on
    # [H_cam | r] (replaces full-U SVD, msckf.h:954-957 — any orthonormal
    # basis gives the identical update; see ops/linalg.null_project_3). The
    # 15 IMU columns of H_x are identically zero (msckf.h:905-958 writes only
    # camera blocks) and the projection acts row-wise, so they are prepended
    # AFTER projection instead of being carried through it.
    cols = [H_cam, r_rows[:, None]]
    if config.filter.use_anisotropic_r:
        # v-row indicator columns I_odd (row 2i+1 marks obs i's v residual)
        cols.append(
            (jnp.arange(2 * M)[:, None] == 2 * jnp.arange(M)[None, :] + 1).astype(dtype)
        )
    Xr = jnp.concatenate(cols, axis=1)                    # (2M, 6N+1[+M])
    proj = null_project_3(H_f_rows, Xr)                   # (2M-3, 6N+1[+M])
    H_o = jnp.concatenate(
        [jnp.zeros((2 * M - 3, 15), dtype), proj[:, : 6 * N]], axis=1
    )
    r_o = proj[:, 6 * N]

    rows_valid = jnp.arange(2 * M - 3) < jnp.maximum(2 * m - 3, 0)
    H_o = H_o * rows_valid[:, None]
    r_o = r_o * rows_valid
    V = None
    if config.filter.use_anisotropic_r:
        V = proj[:, 6 * N + 1 :] * rows_valid[:, None]
    return H_o, r_o, rows_valid, V


def _psd_solve(S, b):
    """Cholesky solve for the S = (·)P(·)ᵀ + σ²I systems.

    TPU-motivated replacement for LU: batched getrf's row pivoting lowers to
    a long sequential scalar/gather loop (measured: the single biggest cost
    of the round-1 frame step), while potrf is pivot-free and blocked. S is
    PSD by construction — Joseph-form updates keep P PSD up to roundoff and
    σ²I dominates the f32 noise floor — and if a pathological batch element
    ever went indefinite, the NaN propagates to a False gate / is caught by
    the bench's finiteness sanity rather than silently corrupting (the
    reference's LDLT would silently tolerate it, msckf.h:1115/1370).
    """
    L = jax.scipy.linalg.cholesky(S, lower=True)
    return jax.scipy.linalg.cho_solve((L, True), b)


def gating_test(H_o, r_o, rows_valid, P, dof, sigma2, config: MsckfConfig):
    """Mahalanobis gate (msckf.h:1103-1124), incl. the table[dof+1] quirk."""
    dof = jnp.asarray(dof)
    return gating_test_all(H_o[None], r_o[None], P, dof[None], sigma2, config)[0]


def gating_test_all(H_all, r_all, P, dof, sigma2, config: MsckfConfig):
    """All staged tracks' Mahalanobis gates in one batched computation.

    H_all: (S, R, D); r_all: (S, R); dof: (S,). A per-track vmap here makes
    XLA broadcast P to (S, D, D) per filter (measured: the single hottest
    marginalize sub-stage); flattening the track axis into the matmul row
    dimension keeps one P and puts the work on the MXU.
    """
    dtype = H_all.dtype
    S_, R, D = H_all.shape
    # The gate einsums follow their own precision knob: "high" (3-pass bf16)
    # suffices for a THRESHOLD test (~1e-6 relative on S cannot meaningfully
    # move gamma across an order-1 chi^2 bound) and was ~6% of the frame step
    # at 6-pass (round-3 trace); strict-parity configs keep "highest". The
    # UPDATE math always uses the ambient precision — 3-pass there degrades
    # the covariance over long horizons (MIXED_PRECISION.md addendum).
    gate_prec = {
        "high": jax.lax.Precision.HIGH,
        "default": jax.lax.Precision.DEFAULT,
    }.get(config.filter.gating_precision, jax.lax.Precision.HIGHEST)
    HP = jnp.einsum("srd,de->sre", H_all, P, precision=gate_prec)
    Smat = jnp.einsum("srd,std->srt", HP, H_all, precision=gate_prec) + sigma2 * jnp.eye(R, dtype=dtype)
    if psd_pallas.use_pallas_default():
        gamma = psd_pallas.gamma_psd(Smat, r_all)
    else:
        gamma = jnp.einsum("sr,sr->s", r_all, _psd_solve(Smat, r_all[..., None])[..., 0])
    table = chi2_gate_table(dtype)
    offset = 2 if config.filter.chi2_offbyone else 0
    idx = jnp.clip(dof + offset, 1, table.shape[0] - 1)
    return gamma < table[idx]


def gated_row_stack(obs, obs_mask, p_f, track_ok, window, g, P, sigma2,
                    config: MsckfConfig, m_cap: int | None = None,
                    carry=None, return_carry: bool = False,
                    chunk: int | None = None):
    """Chunked projected-rows + gating + row compaction for S staged tracks.

    Processes the staged-track axis in chunks of ``shapes.staged_chunk``
    through a ``lax.scan``, accumulating compacted rows into the fixed
    ``max_update_rows`` budget. Results are identical to the all-at-once
    vmap + :func:`stack_rows` path up to row ordering (the EKF update is
    invariant to row permutations of [H | r]); what changes is the memory
    profile: peak HLO temp for the dense per-track (2N-3, D) Jacobians and
    the gating S-matrices scales with the chunk size instead of with all S
    staged tracks. At batch 1024 the unchunked path needs ~12 GB of HBM for
    S=64 (measured OOM, round 2); chunked at C=8 it needs ~1.5 GB.

    Returns (H (R_MAX, D), r (R_MAX,), gate_ok (S,), rows_present (S,),
    n_dropped[, V (R_MAX, N), v_track_ids (R_MAX,) when
    ``use_anisotropic_r``]). ``v_track_ids[j]`` is 1 + the staged-track index
    that produced row j (0 for padding rows); downstream the reference's
    *block-diagonal-per-track* R_o (msckf.h:411-431 stacks each track's block
    at its own offset) is reproduced by zeroing VVᵀ products between rows with
    different ids — without it, tracks observing the same window slots would
    acquire spurious cross-track noise correlations.
    ``rows_present[s]`` is True iff track s contributed at least
    one valid row (its gate passed AND it produced non-masked projected rows —
    a track whose observations all fail the depth guard yields zero rows even
    with a trivially-passing gate).

    ``m_cap`` bounds the per-track observation width of the row math (see
    :func:`track_projected_rows`) — rows shrink from 2N-3 to 2M-3; rows lost
    to the cap on contributing tracks are added to ``n_dropped``. ``carry``
    chains a second staged set into the SAME row buffer (the fused
    marginalize+prune update passes marginalize's carry here so both sets
    share one EKF update); pass ``return_carry=True`` to get
    (gate_ok, rows_present, carry) instead of the finalized stack. The
    buffer layout is cap-independent (aniso V columns are padded to N), so
    differently-capped calls chain safely. ``chunk`` overrides
    ``shapes.staged_chunk`` for this call (the prune path's capped rows let
    it run much larger chunks at the same peak HBM — ``shapes.prune_chunk``).
    """
    S, N, _ = obs.shape
    M = N if m_cap is None else max(2, min(int(m_cap), N))
    R = 2 * M - 3
    D = config.shapes.state_dim
    R_MAX = config.shapes.max_update_rows
    aniso = config.filter.use_anisotropic_r
    W = D + 1 + (N + 1 if aniso else 0)
    C = min(chunk or config.shapes.staged_chunk, S)
    while S % C:
        C -= 1
    n_chunks = S // C
    dtype = obs.dtype

    # Gate dof follows the rows actually available: min(m, M) - 1 == the
    # uncapped reference dof whenever the cap is inactive (msckf.h:1117).
    dof = jnp.minimum(jnp.sum(obs_mask, axis=1), M).astype(jnp.int32) - 1
    # Rows the cap costs each track (counted into n_dropped for tracks that
    # contribute): raw-mask based — the depth guard's rare extra invalidation
    # is not double-counted against the cap.
    m_raw = jnp.sum(obs_mask, axis=1).astype(jnp.int32)
    cap_lost_all = jnp.maximum(2 * m_raw - 3, 0) - jnp.maximum(
        2 * jnp.minimum(m_raw, M) - 3, 0
    )

    xs = (
        obs.reshape(n_chunks, C, N, 2),
        obs_mask.reshape(n_chunks, C, N),
        p_f.reshape(n_chunks, C, 3),
        track_ok.reshape(n_chunks, C),
        dof.reshape(n_chunks, C),
        jnp.arange(S, dtype=jnp.int32).reshape(n_chunks, C),
        cap_lost_all.reshape(n_chunks, C),
    )

    # Row compaction into the fixed budget is a one-hot selection MATMUL:
    # buf += Sel @ rows with Sel[j, i] = [target(i) == j], target from a
    # cumsum of the row-keep mask offset by the carried count. Replaces the
    # round-2 argsort + gather + dynamic_update_slice (measured ~25% of the
    # whole frame step at batch 1024: batched gathers with per-filter
    # indices lower to per-element loops on TPU, while this is one MXU GEMM
    # per chunk). One-hot matmuls at HIGHEST precision are exact. Rows whose
    # target lands beyond R_MAX match no Sel row — exactly the old overflow-
    # drop semantics, and the kept-row ORDER is also identical (chunk order).
    # Carry inits derive from the data (not fresh constants) so their
    # varying-axis status matches the loop outputs under shard_map.
    if carry is None:
        zf = obs.ravel()[0] * 0
        zi = dof.ravel()[0] * 0
        buf = jnp.zeros((R_MAX, W), dtype) + zf
        carry = (buf, zi, zi, zi)
    row_ids = jnp.arange(R_MAX, dtype=jnp.int32)

    def body(carry, x):
        buf, count, total, capped = carry
        o, m, pf, ok, df, sid, lost = x
        H_c, r_c, rv_c, V_c = jax.vmap(
            lambda oo, mm, pp: track_projected_rows(
                oo, mm, pp, window, g, config, m_cap=m_cap)
        )(o, m, pf)
        gate_c = gating_test_all(H_c, r_c, P, df, sigma2, config)
        rm = rv_c & (ok & gate_c)[:, None]
        cols = [H_c, r_c[..., None]]
        if aniso:
            # 1-based track-id column (0 = padding row; a padding row's V is
            # all-zero so its products vanish either way — the +1 just keeps
            # ids unambiguous). Capped V is padded to the cap-independent
            # buffer width N so carries chain across differently-capped calls.
            tid = jnp.broadcast_to(
                (sid + 1).astype(dtype)[:, None, None], (C, R, 1)
            )
            if M != N:
                V_c = jnp.pad(V_c, ((0, 0), (0, 0), (0, N - M)))
            cols += [V_c, tid]
        rows = jnp.concatenate(cols, axis=-1).reshape(C * R, W)
        rmf = rm.reshape(C * R)
        nv = jnp.sum(rmf).astype(jnp.int32)
        tgt = count + jnp.cumsum(rmf.astype(jnp.int32)) - 1
        sel = ((tgt[None, :] == row_ids[:, None]) & rmf[None, :]).astype(dtype)
        buf = buf + jnp.matmul(sel, rows, precision=jax.lax.Precision.HIGHEST)
        count = jnp.minimum(count + nv, R_MAX)
        n_capped = jnp.sum(
            lost * (ok & gate_c & jnp.any(rm, axis=1))
        ).astype(capped.dtype)
        return (buf, count, total + nv, capped + n_capped), (
            gate_c, jnp.any(rm, axis=1))

    carry, (gate_ok, rows_present) = jax.lax.scan(body, carry, xs)
    gate_ok = gate_ok.reshape(S)
    rows_present = rows_present.reshape(S)
    if return_carry:
        return gate_ok, rows_present, carry
    buf, _, total, capped = carry
    H = buf[:R_MAX, :D]
    r = buf[:R_MAX, D]
    n_dropped = (jnp.maximum(total - R_MAX, 0) + capped).astype(jnp.int32)
    out = (H, r, gate_ok, rows_present, n_dropped)
    if aniso:
        out = out + (buf[:R_MAX, D + 1 : D + 1 + N], buf[:R_MAX, D + 1 + N])
    return out


def stack_rows(H_all, r_all, row_masks, config: MsckfConfig):
    """Compact valid projected rows from all tracks into the fixed budget.

    H_all: (S, R_t, D); r_all: (S, R_t); row_masks: (S, R_t).
    Returns (H (R_MAX, D), r (R_MAX,), n_dropped).
    """
    R_MAX = config.shapes.max_update_rows
    S, R_t, D = H_all.shape
    flat_H = H_all.reshape(S * R_t, D)
    flat_r = r_all.reshape(S * R_t)
    flat_m = row_masks.reshape(S * R_t)

    order = jnp.argsort(jnp.logical_not(flat_m), stable=True)[:R_MAX]
    sel_valid = flat_m[order]
    H = flat_H[order] * sel_valid[:, None]
    r = flat_r[order] * sel_valid
    n_dropped = jnp.maximum(jnp.sum(flat_m) - R_MAX, 0).astype(jnp.int32)
    return H, r, n_dropped


def apply_correction(state: FilterState, deltaX, config: MsckfConfig) -> FilterState:
    """Multiplicative state correction (msckf.h:1375-1391)."""
    N = config.shapes.num_slots
    imu = state.imu
    dq = quat.build_update_quat(deltaX[0:3])
    imu = imu.replace(
        q_IG=quat.mul(dq, imu.q_IG),
        b_g=imu.b_g + deltaX[3:6],
        v_I_G=imu.v_I_G + deltaX[6:9],
        b_a=imu.b_a + deltaX[9:12],
        p_I_G=imu.p_I_G + deltaX[12:15],
    )
    dc = deltaX[15:].reshape(N, 6)
    dq_c = quat.build_update_quat(dc[:, 0:3])
    window = state.window
    window = window.replace(
        q_CG=quat.normalize(quat.mul(dq_c, window.q_CG)),
        p_C_G=window.p_C_G + dc[:, 3:6],
    )
    return state.replace(imu=imu, window=window)


def compress_rows(H, r):
    """QR measurement compression with nonzero-row masking.

    The fixed-shape analogue of msckf.h:1343-1366: H = Q₁·T_H with T_H the R
    factor; rows of T_H with (numerically) zero content carry no information —
    the reference drops them, we zero them (and the matching r_n entries), so
    the downstream solve sees only the σ² diagonal there. This is exact (no
    Gram squaring, no jitter) and rank-robust in f32.
    """
    Q, R = jnp.linalg.qr(H, mode="reduced")  # (rows, D), (D, D)
    r_n = Q.T @ r
    row_norm = jnp.max(jnp.abs(R), axis=1)
    keep = row_norm > 1e-6 * jnp.maximum(jnp.max(row_norm), 1e-30)
    T_H = R * keep[:, None]
    r_n = r_n * keep
    return T_H, r_n


def measurement_update(state: FilterState, H, r, sigma2, config: MsckfConfig,
                       V=None, v_track_ids=None) -> FilterState:
    """EKF update (msckf.h:1325-1423): Kalman gain via a Cholesky solve,
    multiplicative correction, Joseph-form covariance.

    The reference's Householder-QR "T_H" compression (msckf.h:1343-1366)
    exists to shrink the CPU solve; with isotropic R = σ²I the compressed and
    direct updates are algebraically identical (H = Q₁T_H ⇒ Q₁ᵀRQ₁ = σ²I), so
    on TPU we solve S = HPHᵀ + σ²I directly — three MXU matmuls and one
    pivot-free potrf instead of a batched Householder QR (measured ~4×
    cheaper at (384×183)). Zero padding rows contribute exact σ² diagonals
    and zero gain. Set ``FilterConfig.use_qr_compression`` for the
    reference-shaped path.

    ``V`` (rows, N): projected v-row coefficients; when given (anisotropic-R
    parity mode), the noise is R_n = σu²I + (σv²-σu²)·M with
    M = VVᵀ ⊙ [same-track], which is exactly the reference's block-diagonal
    R_o (msckf.h:411-431, one A_jᵀdiag(u',v')A_j block per track at its own
    row offset; the projection basis is irrelevant — the update is
    basis-invariant). ``v_track_ids`` (rows,) supplies the per-row track tag
    from :func:`gated_row_stack`; without it (single-track callers) M = VVᵀ,
    which is the same thing because all rows share one track.
    """
    dtype = H.dtype
    D = H.shape[1]
    P = state.P

    if V is not None:
        # v-u noise delta scaled from the PER-FILTER sigma2 (state.meas_sigma2
        # via the callers), preserving the config's v/u variance ratio: a grid
        # fleet with per-filter meas_sigma gets a consistent anisotropic R_o,
        # and at sigma2 == u_var_prime this is exactly the reference's
        # v_var_prime - u_var_prime (msckf.h:411-431).
        ratio = jnp.asarray(config.v_var_prime / config.u_var_prime - 1.0, dtype)
        dv = jnp.asarray(sigma2, dtype) * ratio
        M = V @ V.T
        if v_track_ids is not None:
            M = M * (v_track_ids[:, None] == v_track_ids[None, :])

    if config.filter.use_qr_compression:
        if V is None:
            H, r = compress_rows(H, r)  # (k, D), k = min(rows, D)
        else:
            # Reference-exact compressed-anisotropic update: with R_o != σ²I
            # the compressed and direct updates are NOT algebraically equal
            # (the dropped-row block of Q couples through R_o), so parity
            # requires projecting R_o = σu²I + dv·M through Q₁ exactly as
            # msckf.h:1365-1366 does (R_n = Q₁ᵀ R_o Q₁). Row keep uses the
            # reference's exact-nonzero rule (R.rowwise().any(),
            # msckf.h:1347), not compress_rows' relative tolerance.
            # Measured: this closes the residual ~4e-6 state gap vs the
            # compiled reference (tools/ref_harness/run_parity.py).
            Q, Rq = jnp.linalg.qr(H, mode="reduced")
            keep = jnp.max(jnp.abs(Rq), axis=1) > 0.0
            H = Rq * keep[:, None]
            Q1 = Q * keep[None, :]
            r = (Q.T @ r) * keep
            M = Q1.T @ M @ Q1

    S_mat = H @ P @ H.T + sigma2 * jnp.eye(H.shape[0], dtype=dtype)
    if V is not None:
        S_mat = S_mat + dv * M
    # K = P Hᵀ S⁻¹ via Cholesky (see _psd_solve for the TPU rationale).
    K = _psd_solve(S_mat, H @ P).T
    deltaX = K @ r

    IKH = jnp.eye(D, dtype=dtype) - K @ H
    P_new = IKH @ P @ IKH.T + sigma2 * (K @ K.T)
    if V is not None:
        P_new = P_new + dv * (K @ M @ K.T)
    P_new = 0.5 * (P_new + P_new.T)

    state = apply_correction(state, deltaX, config)
    return state.replace(P=P_new)


def marginalize_prep(state: FilterState, staged: StagedTracks, config: MsckfConfig):
    """Motion gate + LM triangulation for the staged tracks (the front half
    of msckf.h:336-449). Returns (p_f_G, track_ok, motion_ok, tri_ok)."""
    fcfg = config.filter
    window = state.window

    motion_ok = jax.vmap(
        lambda o, om: triangulate.check_motion(
            o, om, window.q_CG, window.p_C_G, fcfg.translation_threshold
        )
    )(staged.obs, staged.obs_mask)
    motion_ok = motion_ok | (state.num_residualized <= 3)
    motion_ok = motion_ok & staged.valid

    p_f_G, tri_ok = jax.vmap(
        lambda o, om: triangulate.initialize_position(
            o, om, window.q_CG, window.p_C_G, config.max_gn_cost_norm,
            n_iters=fcfg.lm_iters, n_trials=fcfg.lm_trials,
        )
    )(staged.obs, staged.obs_mask)
    # Degenerate geometry can yield non-finite points; those tracks are already
    # rejected (NaN comparisons gate False), but the values must be sanitized
    # so masked-out rows multiply to exact zeros downstream.
    tri_ok = tri_ok & jnp.all(jnp.isfinite(p_f_G), axis=-1)
    track_ok = motion_ok & tri_ok
    p_f_G = jnp.nan_to_num(p_f_G, nan=0.0, posinf=0.0, neginf=0.0)
    return p_f_G, track_ok, motion_ok, tri_ok


def marginalize_post(state: FilterState, staged: StagedTracks, p_f_G, track_ok,
                     motion_ok, tri_ok, gate_ok, rows_present, n_dropped,
                     config: MsckfConfig) -> FilterState:
    """Diagnostics + map bookkeeping for the staged-track update (the back
    half of msckf.h:336-449)."""
    dtype = state.P.dtype
    diag = state.diag.replace(
        row_overflow=state.diag.row_overflow + n_dropped,
        motion_rejects=state.diag.motion_rejects
        + jnp.sum(staged.valid & ~motion_ok).astype(jnp.int32),
        triangulation_rejects=state.diag.triangulation_rejects
        + jnp.sum(motion_ok & ~tri_ok).astype(jnp.int32),
        gating_rejects=state.diag.gating_rejects
        + jnp.sum(track_ok & ~gate_ok).astype(jnp.int32),
        updates_applied=state.diag.updates_applied
        + jnp.any(rows_present).astype(jnp.int32),
    )
    map_mask = track_ok
    return state.replace(
        num_residualized=state.num_residualized + jnp.sum(track_ok).astype(jnp.int32),
        map_pts=jnp.where(map_mask[:, None], p_f_G, 0.0).astype(dtype),
        map_mask=map_mask,
        diag=diag,
    )


def marginalize(state: FilterState, staged: StagedTracks, config: MsckfConfig) -> FilterState:
    """Residualize staged tracks and update (msckf.h:336-449).

    Pipeline per staged track: motion gate (skipped for the first 4
    residualized tracks, msckf.h:354) -> LM triangulation -> projected rows ->
    Mahalanobis gate -> global row stack -> one joint EKF update.
    """
    dtype = state.P.dtype
    sigma2 = state.meas_sigma2.astype(dtype)  # per-filter noise (grid fleets)
    window = state.window
    g = state.imu.g

    p_f_G, track_ok, motion_ok, tri_ok = marginalize_prep(state, staged, config)

    out = gated_row_stack(
        staged.obs, staged.obs_mask, p_f_G, track_ok, window, g, state.P,
        sigma2, config, m_cap=config.shapes.marg_obs_cap or None,
    )
    H, r, gate_ok, rows_present, n_dropped = out[:5]
    V, tids = (out[5], out[6]) if config.filter.use_anisotropic_r else (None, None)

    state = measurement_update(state, H, r, sigma2, config, V=V, v_track_ids=tids)
    return marginalize_post(
        state, staged, p_f_G, track_ok, motion_ok, tri_ok, gate_ok,
        rows_present, n_dropped, config,
    )
