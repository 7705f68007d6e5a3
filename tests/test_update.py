import numpy as np
import jax
import jax.numpy as jnp

from msckf_mono_tpu.core import update as upd
from msckf_mono_tpu.core.types import init_filter_state, StagedTracks
from msckf_mono_tpu.utils import quat
from msckf_mono_tpu.utils.config import MsckfConfig

CFG = MsckfConfig()
N = CFG.shapes.num_slots
D = CFG.shapes.state_dim


def _state_with_window(n_cams=8, seed=0, dtype=jnp.float64):
    rng = np.random.default_rng(seed)
    state = init_filter_state(CFG, dtype=dtype)
    q = np.zeros((N, 4))
    q[:, 0] = 1.0
    p = np.zeros((N, 3))
    valid = np.zeros((N,), bool)
    for i in range(n_cams):
        axis = rng.normal(size=3) * 0.02
        angle = np.linalg.norm(axis)
        q[i] = [np.cos(angle / 2), *(axis / max(angle, 1e-12) * np.sin(angle / 2))]
        p[i] = [0.3 * i, 0.02 * i, 0.01 * i]
        valid[i] = True
    window = state.window.replace(
        q_CG=jnp.asarray(q, dtype),
        p_C_G=jnp.asarray(p, dtype),
        valid=jnp.asarray(valid),
        state_id=jnp.where(jnp.asarray(valid), jnp.arange(N), -1),
    )
    # seed a reasonable covariance over valid dims
    Dv = 15 + 6 * n_cams
    X = rng.normal(size=(Dv, Dv))
    Pv = X @ X.T * 1e-6 + np.eye(Dv) * 1e-4
    P = np.zeros((D, D))
    P[:Dv, :Dv] = Pv
    return state.replace(window=window, P=jnp.asarray(P, dtype))


def _observe(state, point, n_obs, noise=0.0, seed=1):
    rng = np.random.default_rng(seed)
    q = np.asarray(state.window.q_CG)
    p = np.asarray(state.window.p_C_G)
    obs = np.zeros((N, 2))
    mask = np.zeros((N,), bool)
    for i in range(n_obs):
        R = np.asarray(quat.to_rotmat(jnp.asarray(q[i])))
        pc = R @ (point - p[i])
        obs[i] = pc[:2] / pc[2] + rng.normal(size=2) * noise
        mask[i] = True
    return jnp.asarray(obs, state.P.dtype), jnp.asarray(mask)


def test_projected_rows_nullspace_property():
    """H_o rows must be orthogonal to the feature-position Jacobian and
    numerically reproduce d(residual)/d(state) for the window states."""
    state = _state_with_window(8)
    point = np.array([0.5, -0.3, 4.0])
    obs, mask = _observe(state, point, 8)
    g = state.imu.g

    H_o, r_o, rows_valid, _V = upd.track_projected_rows(
        obs, mask, jnp.asarray(point), state.window, g, CFG
    )
    H_o, r_o = np.asarray(H_o), np.asarray(r_o)
    m = 8
    # rows beyond 2m-3 are exactly zero
    assert np.all(H_o[2 * m - 3 :] == 0)
    assert np.all(r_o[2 * m - 3 :] == 0)
    # perfect observations => zero residual
    np.testing.assert_allclose(r_o, 0, atol=1e-9)
    # valid rows have unit-ish norms (information present)
    assert np.linalg.norm(H_o[: 2 * m - 3]) > 1e-3


def test_projected_rows_residual_consistency():
    """r_o ≈ H_o-projected linearization: moving a camera by delta changes the
    residual as -H_x@delta in the projected space."""
    state = _state_with_window(8)
    point = np.array([0.5, -0.3, 4.0])
    obs, mask = _observe(state, point, 8)
    g = state.imu.g

    # Perturb camera slot 2 position
    delta = np.zeros((D,))
    dp = np.array([0.003, -0.002, 0.001])
    delta[15 + 6 * 2 + 3 : 15 + 6 * 2 + 6] = dp
    window2 = state.window.replace(
        p_C_G=state.window.p_C_G.at[2].add(jnp.asarray(dp))
    )

    H_o, r_o, _, _V = upd.track_projected_rows(
        obs, mask, jnp.asarray(point), state.window, g, CFG
    )
    H_o2, r_o2, _, _V2 = upd.track_projected_rows(
        obs, mask, jnp.asarray(point), window2, g, CFG
    )
    # residual after perturbation ≈ r - H delta in each basis; bases differ only
    # where H_f changed (tiny), compare magnitudes
    pred = np.linalg.norm(np.asarray(r_o) - np.asarray(H_o) @ delta)
    got = np.linalg.norm(np.asarray(r_o2))
    np.testing.assert_allclose(got, pred, rtol=2e-2, atol=1e-7)


def test_gating_accepts_consistent_rejects_inconsistent():
    state = _state_with_window(8)
    point = np.array([0.5, -0.3, 4.0])
    sigma2 = CFG.u_var_prime
    g = state.imu.g

    obs, mask = _observe(state, point, 8, noise=np.sqrt(sigma2) * 0.5)
    H_o, r_o, rv, _V = upd.track_projected_rows(
        obs, mask, jnp.asarray(point), state.window, g, CFG
    )
    ok = upd.gating_test(H_o, r_o, rv, state.P, 7, sigma2, CFG)
    assert bool(ok)

    # Per-observation outliers: not explainable by any single 3D point, so the
    # residual survives the nullspace projection and must be gated out.
    rng = np.random.default_rng(9)
    obs_bad = jnp.asarray(np.asarray(obs) + rng.normal(size=obs.shape) * 0.05 * np.asarray(mask)[:, None])
    H_b, r_b, rv_b, _Vb = upd.track_projected_rows(
        obs_bad, mask, jnp.asarray(point), state.window, g, CFG
    )
    ok_bad = upd.gating_test(H_b, r_b, rv_b, state.P, 7, sigma2, CFG)
    assert not bool(ok_bad)


def test_measurement_update_reduces_uncertainty_and_error():
    """EKF sanity: an update from a perturbed camera position should shrink
    covariance and pull the state toward truth."""
    state = _state_with_window(8)
    point = np.array([0.5, -0.3, 4.0])
    g = state.imu.g
    sigma2 = CFG.u_var_prime

    # True camera 3 is shifted; observations generated from the TRUE window.
    dp_true = np.array([0.01, -0.008, 0.005])
    true_window = state.window.replace(
        p_C_G=state.window.p_C_G.at[3].add(jnp.asarray(dp_true))
    )
    true_state = state.replace(window=true_window)
    obs, mask = _observe(true_state, point, 8)

    H_o, r_o, rv, _V = upd.track_projected_rows(
        obs, mask, jnp.asarray(point), state.window, g, CFG
    )
    S = CFG.shapes.max_staged
    H_all = jnp.tile(H_o[None], (S, 1, 1)) * 0
    r_all = jnp.tile(r_o[None], (S, 1)) * 0
    masks = jnp.zeros((S, H_o.shape[0]), bool)
    H_all = H_all.at[0].set(H_o)
    r_all = r_all.at[0].set(r_o)
    masks = masks.at[0].set(rv)

    H, r, dropped = upd.stack_rows(H_all, r_all, masks, CFG)
    assert int(dropped) == 0

    before_err = float(jnp.linalg.norm(true_window.p_C_G[3] - state.window.p_C_G[3]))
    before_tr = float(jnp.trace(state.P))
    new_state = upd.measurement_update(state, H, r, sigma2, CFG)
    after_err = float(jnp.linalg.norm(true_window.p_C_G[3] - new_state.window.p_C_G[3]))
    after_tr = float(jnp.trace(new_state.P))

    assert after_tr < before_tr
    assert after_err < before_err
    P = np.asarray(new_state.P)
    np.testing.assert_allclose(P, P.T, atol=1e-12)
    Dv = 15 + 6 * 8
    assert np.all(np.linalg.eigvalsh(P[:Dv, :Dv]) > -1e-12)
    # invalid dims untouched (zero)
    assert np.all(P[Dv:, :] == 0)


def test_marginalize_end_to_end_improves_state():
    """Full marginalize: stage one track observed by a slightly-wrong window."""
    state = _state_with_window(10, seed=5)
    point = np.array([0.4, 0.2, 5.0])
    # truth = current window; inject error into the ESTIMATED window
    obs, mask = _observe(state, point, 10)
    dp_err = np.array([0.004, 0.003, -0.002])
    est_window = state.window.replace(
        p_C_G=state.window.p_C_G.at[4].add(jnp.asarray(dp_err))
    )
    est_state = state.replace(window=est_window, num_residualized=jnp.asarray(10, jnp.int32))

    S = CFG.shapes.max_staged
    staged = StagedTracks(
        obs=jnp.zeros((S, N, 2), state.P.dtype).at[0].set(obs),
        obs_mask=jnp.zeros((S, N), bool).at[0].set(mask),
        feature_id=jnp.full((S,), -1, jnp.int32).at[0].set(7),
        valid=jnp.zeros((S,), bool).at[0].set(True),
    )

    before = float(jnp.linalg.norm(est_state.window.p_C_G[4] - state.window.p_C_G[4]))
    out = upd.marginalize(est_state, staged, CFG)
    after = float(jnp.linalg.norm(out.window.p_C_G[4] - state.window.p_C_G[4]))
    assert int(out.num_residualized) == 11
    assert bool(out.map_mask[0])
    # triangulated point close to truth
    np.testing.assert_allclose(np.asarray(out.map_pts[0]), point, atol=0.05)
    assert after < before


def test_marginalize_empty_staged_is_noop_on_state():
    state = _state_with_window(6, seed=2)
    S = CFG.shapes.max_staged
    staged = StagedTracks(
        obs=jnp.zeros((S, N, 2), state.P.dtype),
        obs_mask=jnp.zeros((S, N), bool),
        feature_id=jnp.full((S,), -1, jnp.int32),
        valid=jnp.zeros((S,), bool),
    )
    out = upd.marginalize(state, staged, CFG)
    np.testing.assert_allclose(np.asarray(out.P), np.asarray(state.P), atol=1e-9)
    np.testing.assert_allclose(
        np.asarray(out.window.p_C_G), np.asarray(state.window.p_C_G), atol=1e-12
    )
    assert int(out.num_residualized) == 0


def _staged_fixture(n_tracks, n_obs_each, seed=11):
    """A window + n_tracks staged tracks with triangulated points."""
    import dataclasses

    state = _state_with_window(10, seed=seed)
    rng = np.random.default_rng(seed)
    S = max(16, CFG.shapes.max_staged)  # independent of the staging budget
    obs = np.zeros((S, N, 2))
    masks = np.zeros((S, N), bool)
    pts = np.zeros((S, 3))
    ok = np.zeros((S,), bool)
    for s in range(n_tracks):
        point = np.array([rng.uniform(-1, 1), rng.uniform(-1, 1), rng.uniform(3, 8)])
        o, m = _observe(state, point, n_obs_each[s], noise=1e-4, seed=seed + s)
        obs[s], masks[s], pts[s], ok[s] = np.asarray(o), np.asarray(m), point, True
    return state, jnp.asarray(obs), jnp.asarray(masks), jnp.asarray(pts), jnp.asarray(ok)


def test_gated_row_stack_matches_unchunked():
    """ADVICE r2: chunked gated_row_stack must equal the vmap + stack_rows
    path for several chunk sizes (incl. non-divisors) and an overflow case.

    Row order may differ (the EKF update is invariant to row permutations of
    [H|r]); compare the permutation-invariant sufficient statistics HᵀH, Hᵀr
    plus exact gate verdicts and drop counts.
    """
    import dataclasses

    g = jnp.asarray([0.0, 0.0, -9.81])
    sigma2 = jnp.asarray(CFG.u_var_prime)

    n_tracks = 12
    n_obs = [2 + (i % 7) for i in range(n_tracks)]
    state, obs, masks, pts, ok = _staged_fixture(n_tracks, n_obs)
    window, P = state.window, state.P

    # Unchunked reference: per-track rows -> batched gate -> global compaction.
    H_all, r_all, rv_all, _ = jax.vmap(
        lambda o, m, p: upd.track_projected_rows(o, m, p, window, g, CFG)
    )(obs, masks, pts)
    dof = jnp.sum(masks, axis=1).astype(jnp.int32) - 1
    gate_ref = upd.gating_test_all(H_all, r_all, P, dof, sigma2, CFG)
    rm = rv_all & (ok & gate_ref)[:, None]
    H_ref, r_ref, drop_ref = upd.stack_rows(H_all * rm[:, :, None], r_all * rm, rm, CFG)

    for chunk in (3, 4, 5, 8, 32):
        cfg = dataclasses.replace(
            CFG, shapes=dataclasses.replace(CFG.shapes, staged_chunk=chunk)
        )
        H, r, gate_ok, rows_present, dropped = upd.gated_row_stack(
            obs, masks, pts, ok, window, g, P, sigma2, cfg
        )
        np.testing.assert_array_equal(np.asarray(gate_ok), np.asarray(gate_ref))
        np.testing.assert_array_equal(
            np.asarray(rows_present), np.asarray(jnp.any(rm, axis=1))
        )
        assert int(dropped) == int(drop_ref)
        np.testing.assert_allclose(
            np.asarray(H.T @ H), np.asarray(H_ref.T @ H_ref), atol=1e-9
        )
        np.testing.assert_allclose(
            np.asarray(H.T @ r), np.asarray(H_ref.T @ r_ref), atol=1e-9
        )


def test_gated_row_stack_overflow_drops_consistently():
    """Overflow (> max_update_rows) must report identical drop counts and keep
    exactly R_MAX rows in both paths."""
    import dataclasses

    g = jnp.asarray([0.0, 0.0, -9.81])
    sigma2 = jnp.asarray(CFG.u_var_prime)

    # Force overflow with a tiny row budget.
    small = dataclasses.replace(
        CFG, shapes=dataclasses.replace(CFG.shapes, max_update_rows=24, staged_chunk=5)
    )
    n_tracks = 10
    n_obs = [6] * n_tracks  # 2*6-3 = 9 rows/track >> 24 total budget
    state, obs, masks, pts, ok = _staged_fixture(n_tracks, n_obs, seed=3)
    window, P = state.window, state.P

    H_all, r_all, rv_all, _ = jax.vmap(
        lambda o, m, p: upd.track_projected_rows(o, m, p, window, g, small)
    )(obs, masks, pts)
    dof = jnp.sum(masks, axis=1).astype(jnp.int32) - 1
    gate_ref = upd.gating_test_all(H_all, r_all, P, dof, sigma2, small)
    rm = rv_all & (ok & gate_ref)[:, None]
    _, _, drop_ref = upd.stack_rows(H_all * rm[:, :, None], r_all * rm, rm, small)

    H, r, gate_ok, _rp, dropped = upd.gated_row_stack(
        obs, masks, pts, ok, window, g, P, sigma2, small
    )
    assert int(drop_ref) > 0
    assert int(dropped) == int(drop_ref)
    assert H.shape[0] == 24
    # every kept row is a real row (nonzero) since overflow means a full buffer
    assert float(jnp.min(jnp.sum(H * H, axis=1))) > 0.0


def test_anisotropic_r_matches_reference_formulation():
    """use_anisotropic_r must reproduce the reference's exact update with
    R_o = A_jᵀ diag(u_var', v_var') A_j (msckf.h:411-431), computed here
    independently via an SVD nullspace basis (the update is basis-invariant).
    """
    import dataclasses

    cfg = dataclasses.replace(
        CFG, filter=dataclasses.replace(CFG.filter, use_anisotropic_r=True)
    )
    # Make the anisotropy pronounced so the test can't pass by accident.
    cfg = dataclasses.replace(
        cfg, camera=dataclasses.replace(cfg.camera, f_v=cfg.camera.f_u * 0.5)
    )
    assert abs(cfg.v_var_prime - cfg.u_var_prime) > 1e-6

    state = _state_with_window(8, seed=9)
    g = jnp.asarray([0.0, 0.0, -9.81])
    point = np.array([0.3, -0.2, 6.0])
    n_obs = 6
    obs, mask = _observe(state, point, n_obs, noise=1e-3, seed=4)

    # ---- our path: projected rows + low-rank R_o in measurement_update ----
    H_o, r_o, rv, V = upd.track_projected_rows(
        obs, mask, jnp.asarray(point), state.window, g, cfg
    )
    ours = upd.measurement_update(
        state, H_o * rv[:, None], r_o * rv, jnp.asarray(cfg.u_var_prime), cfg,
        V=V * rv[:, None],
    )

    # ---- reference-style: explicit SVD nullspace + dense R_o ----
    # Rebuild H_x/H_f/r over the real observations only, mirroring
    # msckf.h:905-978 (same math as track_projected_rows pre-projection).
    from msckf_mono_tpu.utils import quat as q

    Rm = np.stack([np.asarray(q.to_rotmat(state.window.q_CG[i])) for i in range(n_obs)])
    p = np.asarray(state.window.p_C_G[:n_obs])
    dp = point[None, :] - p
    p_f_C = np.einsum("nij,nj->ni", Rm, dp)
    X, Y, Z = p_f_C[:, 0], p_f_C[:, 1], p_f_C[:, 2]
    inv_z = 1.0 / Z
    J = np.zeros((n_obs, 2, 3))
    J[:, 0, 0] = inv_z
    J[:, 0, 2] = -X * inv_z**2
    J[:, 1, 1] = inv_z
    J[:, 1, 2] = -Y * inv_z**2

    def skew(v):
        return np.array([[0, -v[2], v[1]], [v[2], 0, -v[0]], [-v[1], v[0], 0]])

    gnp = np.asarray(g)
    A = np.concatenate(
        [np.einsum("nab,nbc->nac", J, np.stack([skew(v) for v in p_f_C])),
         -np.einsum("nab,nbc->nac", J, Rm)], axis=-1)
    u = np.concatenate(
        [np.einsum("nij,j->ni", Rm, gnp),
         np.einsum("nij,j->ni", np.stack([skew(v) for v in dp]), gnp)], axis=-1)
    uu = np.sum(u * u, axis=-1, keepdims=True)
    Au = np.einsum("nab,nb->na", A, u)
    H_x6 = A - Au[:, :, None] * (u / uu)[:, None, :]
    H_f = -H_x6[:, :, 3:6].reshape(2 * n_obs, 3)
    D_ = cfg.shapes.state_dim
    H_x = np.zeros((2 * n_obs, D_))
    for n in range(n_obs):
        H_x[2 * n : 2 * n + 2, 15 + 6 * n : 15 + 6 * n + 6] = H_x6[n]
    z_hat = np.stack([X * inv_z, Y * inv_z], axis=-1)
    r_full = (np.asarray(obs)[:n_obs] - z_hat).reshape(2 * n_obs)

    U, sv, _ = np.linalg.svd(H_f, full_matrices=True)
    A_j = U[:, 3:]                       # (2m, 2m-3)
    H_o_ref = A_j.T @ H_x
    r_o_ref = A_j.T @ r_full
    rep = np.tile([cfg.u_var_prime, cfg.v_var_prime], n_obs)
    R_o_ref = A_j.T @ np.diag(rep) @ A_j

    P = np.asarray(state.P)
    S = H_o_ref @ P @ H_o_ref.T + R_o_ref
    K = P @ H_o_ref.T @ np.linalg.inv(S)
    dx_ref = K @ r_o_ref
    IKH = np.eye(D_) - K @ H_o_ref
    P_ref = IKH @ P @ IKH.T + K @ R_o_ref @ K.T

    # Compare the position corrections and covariance.
    dx_ours = np.asarray(ours.imu.p_I_G - state.imu.p_I_G)
    np.testing.assert_allclose(dx_ours, dx_ref[12:15], atol=1e-9)
    np.testing.assert_allclose(np.asarray(ours.P), P_ref, atol=1e-8)


def test_anisotropic_equals_isotropic_when_fv_eq_fu():
    """With f_v == f_u the toggle must be a numerical no-op."""
    import dataclasses

    cfg_iso = dataclasses.replace(
        CFG, camera=dataclasses.replace(CFG.camera, f_v=CFG.camera.f_u)
    )
    cfg_an = dataclasses.replace(
        cfg_iso, filter=dataclasses.replace(cfg_iso.filter, use_anisotropic_r=True)
    )
    state = _state_with_window(7, seed=3)
    g = jnp.asarray([0.0, 0.0, -9.81])
    point = np.array([0.1, 0.4, 5.0])
    obs, mask = _observe(state, point, 5, noise=1e-3, seed=8)

    sigma2 = jnp.asarray(cfg_iso.u_var_prime)
    H_i, r_i, rv_i, _ = upd.track_projected_rows(obs, mask, jnp.asarray(point), state.window, g, cfg_iso)
    out_i = upd.measurement_update(state, H_i * rv_i[:, None], r_i * rv_i, sigma2, cfg_iso)
    H_a, r_a, rv_a, V = upd.track_projected_rows(obs, mask, jnp.asarray(point), state.window, g, cfg_an)
    out_a = upd.measurement_update(state, H_a * rv_a[:, None], r_a * rv_a, sigma2, cfg_an, V=V * rv_a[:, None])
    np.testing.assert_allclose(np.asarray(out_a.P), np.asarray(out_i.P), atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(out_a.imu.p_I_G), np.asarray(out_i.imu.p_I_G), atol=1e-12
    )


def test_qr_compression_matches_direct_update():
    """use_qr_compression (the reference's T_H path, msckf.h:1343-1366) must
    produce the identical update to the direct S-form solve with isotropic R
    (H = Q1 T_H => Q1ᵀ R Q1 = sigma^2 I — proved in the module docstring)."""
    import dataclasses

    cfg_qr = dataclasses.replace(
        CFG, filter=dataclasses.replace(CFG.filter, use_qr_compression=True)
    )
    state = _state_with_window(8, seed=12)
    g = jnp.asarray([0.0, 0.0, -9.81])
    point = np.array([0.2, -0.3, 5.5])
    obs, mask = _observe(state, point, 6, noise=1e-3, seed=5)
    sigma2 = jnp.asarray(CFG.u_var_prime)

    H_o, r_o, rv, _ = upd.track_projected_rows(
        obs, mask, jnp.asarray(point), state.window, g, CFG
    )
    H = H_o * rv[:, None]
    r = r_o * rv
    out_direct = upd.measurement_update(state, H, r, sigma2, CFG)
    out_qr = upd.measurement_update(state, H, r, sigma2, cfg_qr)
    np.testing.assert_allclose(
        np.asarray(out_qr.imu.p_I_G), np.asarray(out_direct.imu.p_I_G), atol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(out_qr.P), np.asarray(out_direct.P), atol=1e-9
    )


def _ref_track_block(state, obs_np, n_obs, point, cfg):
    """Reference-style (msckf.h:905-978, 404-431) projected rows for ONE
    track via an SVD nullspace basis: returns (H_o (2m-3, D), r_o (2m-3,),
    R_o (2m-3, 2m-3)) — the track's exact projected noise block."""
    from msckf_mono_tpu.utils import quat as q

    g = np.asarray(state.imu.g)
    Rm = np.stack([np.asarray(q.to_rotmat(state.window.q_CG[i])) for i in range(n_obs)])
    p = np.asarray(state.window.p_C_G[:n_obs])
    dp = point[None, :] - p
    p_f_C = np.einsum("nij,nj->ni", Rm, dp)
    X, Y, Z = p_f_C[:, 0], p_f_C[:, 1], p_f_C[:, 2]
    inv_z = 1.0 / Z
    J = np.zeros((n_obs, 2, 3))
    J[:, 0, 0] = inv_z
    J[:, 0, 2] = -X * inv_z**2
    J[:, 1, 1] = inv_z
    J[:, 1, 2] = -Y * inv_z**2

    def skew(v):
        return np.array([[0, -v[2], v[1]], [v[2], 0, -v[0]], [-v[1], v[0], 0]])

    A = np.concatenate(
        [np.einsum("nab,nbc->nac", J, np.stack([skew(v) for v in p_f_C])),
         -np.einsum("nab,nbc->nac", J, Rm)], axis=-1)
    u = np.concatenate(
        [np.einsum("nij,j->ni", Rm, g),
         np.einsum("nij,j->ni", np.stack([skew(v) for v in dp]), g)], axis=-1)
    uu = np.sum(u * u, axis=-1, keepdims=True)
    Au = np.einsum("nab,nb->na", A, u)
    H_x6 = A - Au[:, :, None] * (u / uu)[:, None, :]
    H_f = -H_x6[:, :, 3:6].reshape(2 * n_obs, 3)
    D_ = cfg.shapes.state_dim
    H_x = np.zeros((2 * n_obs, D_))
    for n in range(n_obs):
        H_x[2 * n : 2 * n + 2, 15 + 6 * n : 15 + 6 * n + 6] = H_x6[n]
    z_hat = np.stack([X * inv_z, Y * inv_z], axis=-1)
    r_full = (obs_np[:n_obs] - z_hat).reshape(2 * n_obs)

    U, _sv, _ = np.linalg.svd(H_f, full_matrices=True)
    A_j = U[:, 3:]
    rep = np.tile([cfg.u_var_prime, cfg.v_var_prime], n_obs)
    return A_j.T @ H_x, A_j.T @ r_full, A_j.T @ np.diag(rep) @ A_j


def test_anisotropic_r_multitrack_block_diagonal():
    """ADVICE r3 (medium): with several staged tracks, R_o must be
    block-diagonal PER TRACK (msckf.h stacks each track's
    A_jᵀdiag(u',v')A_j at its own offset, R_o.block(stack_counter, ...)).
    The v_track_ids masking in measurement_update makes the stacked update
    exactly equal to the dense block-diagonal reference computation."""
    import dataclasses

    cfg = dataclasses.replace(
        CFG, filter=dataclasses.replace(CFG.filter, use_anisotropic_r=True)
    )
    cfg = dataclasses.replace(
        cfg, camera=dataclasses.replace(cfg.camera, f_v=cfg.camera.f_u * 0.5)
    )
    g = jnp.asarray([0.0, 0.0, -9.81])
    sigma2 = jnp.asarray(cfg.u_var_prime)

    state = _state_with_window(8, seed=21)
    state = state.replace(imu=state.imu.replace(g=g))
    rng = np.random.default_rng(5)
    n_obs = [6, 5, 7]
    S = max(16, cfg.shapes.max_staged)
    obs = np.zeros((S, N, 2))
    masks = np.zeros((S, N), bool)
    pts = np.zeros((S, 3))
    ok = np.zeros((S,), bool)
    for s, m in enumerate(n_obs):
        point = np.array([rng.uniform(-0.5, 0.5), rng.uniform(-0.5, 0.5), rng.uniform(4, 7)])
        o, mk = _observe(state, point, m, noise=1e-4, seed=30 + s)
        obs[s], masks[s], pts[s], ok[s] = np.asarray(o), np.asarray(mk), point, True

    out = upd.gated_row_stack(
        jnp.asarray(obs), jnp.asarray(masks), jnp.asarray(pts), jnp.asarray(ok),
        state.window, g, state.P, sigma2, cfg,
    )
    H, r, gate_ok, _rp, nd, V, tids = out
    assert bool(jnp.all(gate_ok[: len(n_obs)])), "fixture tracks must pass the gate"
    assert int(nd) == 0
    # rows of different tracks carry different ids
    real = np.asarray(jnp.sum(V * V, axis=1)) > 0
    assert len(np.unique(np.asarray(tids)[real])) == len(n_obs)

    ours = upd.measurement_update(state, H, r, sigma2, cfg, V=V, v_track_ids=tids)

    # dense reference: stacked rows + block-diagonal R_o
    D_ = cfg.shapes.state_dim
    blocks = [_ref_track_block(state, obs[s], n_obs[s], pts[s], cfg) for s in range(len(n_obs))]
    H_ref = np.concatenate([b[0] for b in blocks])
    r_ref = np.concatenate([b[1] for b in blocks])
    R_ref = np.zeros((H_ref.shape[0], H_ref.shape[0]))
    off = 0
    for b in blocks:
        k = b[2].shape[0]
        R_ref[off : off + k, off : off + k] = b[2]
        off += k

    P = np.asarray(state.P)
    S_mat = H_ref @ P @ H_ref.T + R_ref
    K = P @ H_ref.T @ np.linalg.inv(S_mat)
    dx_ref = K @ r_ref
    IKH = np.eye(D_) - K @ H_ref
    P_ref = IKH @ P @ IKH.T + K @ R_ref @ K.T

    np.testing.assert_allclose(
        np.asarray(ours.imu.p_I_G - state.imu.p_I_G), dx_ref[12:15], atol=1e-9
    )
    np.testing.assert_allclose(np.asarray(ours.P), P_ref, atol=1e-8)
