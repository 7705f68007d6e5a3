import numpy as np
import jax.numpy as jnp

from msckf_mono_tpu.core import prune
from msckf_mono_tpu.core.types import init_filter_state
from msckf_mono_tpu.utils.config import MsckfConfig

CFG = MsckfConfig()
N = CFG.shapes.num_slots
M = CFG.shapes.max_tracks
D = CFG.shapes.state_dim


def _filled_state(n_cams, dtype=jnp.float64, seed=0):
    rng = np.random.default_rng(seed)
    state = init_filter_state(CFG, dtype=dtype)
    q = np.zeros((N, 4))
    q[:, 0] = 1.0
    p = np.zeros((N, 3))
    valid = np.zeros((N,), bool)
    for i in range(n_cams):
        p[i] = [0.5 * i, 0.0, 0.0]
        valid[i] = True
    window = state.window.replace(
        q_CG=jnp.asarray(q, dtype),
        p_C_G=jnp.asarray(p, dtype),
        valid=jnp.asarray(valid),
        state_id=jnp.where(jnp.asarray(valid), jnp.arange(N), -1),
        time=jnp.asarray(np.arange(N) * 0.05, dtype),
    )
    Dv = 15 + 6 * n_cams
    X = rng.normal(size=(Dv, Dv))
    P = np.zeros((D, D))
    P[:Dv, :Dv] = X @ X.T * 1e-6 + np.eye(Dv) * 1e-5
    return state.replace(window=window, P=jnp.asarray(P, dtype))


def _add_track(state, row, fid, slots, uv=0.1):
    t = state.tracks
    obs_mask = np.array(t.obs_mask)
    obs = np.array(t.obs)
    for s in slots:
        obs_mask[row, s] = True
        obs[row, s] = [uv, uv]
    return state.replace(
        tracks=t.replace(
            obs=jnp.asarray(obs, state.P.dtype),
            obs_mask=jnp.asarray(obs_mask),
            active=t.active.at[row].set(True),
            feature_id=t.feature_id.at[row].set(fid),
        )
    )


def test_prune_empty_removes_leading_empty_states():
    n = CFG.filter.max_cam_states + 3
    state = _filled_state(n)
    # Track observing slots 2..n keeps them alive; slots 0,1 are empty.
    state = _add_track(state, 0, 10, list(range(2, n)))
    out = prune.prune_empty_states(state, CFG)
    assert int(out.window.count) == n - 2
    # slot ids shifted
    assert int(out.window.state_id[0]) == 2
    # obs followed the permutation
    assert bool(out.tracks.obs_mask[0, 0])
    assert int(jnp.sum(out.tracks.obs_mask[0])) == n - 2
    # covariance shrunk consistently: valid region nonzero, tail zero
    Dv = 15 + 6 * (n - 2)
    P = np.asarray(out.P)
    assert np.all(P[Dv:, :] == 0) and np.all(P[:, Dv:] == 0)
    np.testing.assert_allclose(P, P.T, atol=1e-12)


def test_prune_empty_noop_when_under_max():
    state = _filled_state(CFG.filter.max_cam_states - 1)
    out = prune.prune_empty_states(state, CFG)
    assert int(out.window.count) == CFG.filter.max_cam_states - 1


def test_prune_empty_noop_when_first_slot_occupied():
    n = CFG.filter.max_cam_states + 2
    state = _filled_state(n)
    state = _add_track(state, 0, 10, list(range(0, n)))
    out = prune.prune_empty_states(state, CFG)
    assert int(out.window.count) == n


def test_prune_empty_covariance_slicing_matches_manual():
    n = CFG.filter.max_cam_states + 2
    state = _filled_state(n, seed=3)
    state = _add_track(state, 0, 10, list(range(2, n)))
    P_before = np.asarray(state.P)
    out = prune.prune_empty_states(state, CFG)
    P_after = np.asarray(out.P)
    keep_dims = np.concatenate([np.arange(15), 15 + 12 + np.arange(6 * (n - 2))])
    np.testing.assert_allclose(
        P_after[: len(keep_dims), : len(keep_dims)],
        P_before[np.ix_(keep_dims, keep_dims)],
        atol=1e-12,
    )


def test_find_redundant_marks_close_states():
    state = _filled_state(22)
    # Make slots 5,6 coincide with slot 4 (close in distance+angle)
    p = np.array(state.window.p_C_G)
    p[5] = p[4] + 1e-4
    p[6] = p[4] - 1e-4
    state = state.replace(window=state.window.replace(p_C_G=jnp.asarray(p, state.P.dtype)))
    rm = np.asarray(prune.find_redundant_slots(state, CFG))
    assert rm[5] and rm[6]
    assert not rm[4]
    # protected last 3
    assert not rm[19] and not rm[20] and not rm[21]


def test_prune_redundant_removes_and_updates():
    state = _filled_state(22, seed=4)
    p = np.array(state.window.p_C_G)
    p[5] = p[4] + 1e-4
    p[6] = p[4] - 1e-4
    state = state.replace(window=state.window.replace(p_C_G=jnp.asarray(p, state.P.dtype)))
    # A long track observing slots 0..21 — includes the doomed 5,6.
    # Use an observation consistent with a far point so triangulation works.
    state = _add_track(state, 0, 10, list(range(22)), uv=0.0)
    # give it realistic obs: point straight ahead at z=10 from each camera
    point = np.array([5.0, 0.0, 10.0])
    obs = np.array(state.tracks.obs)
    for s in range(22):
        pc = point - p[s]
        obs[0, s] = pc[:2] / pc[2]
    state = state.replace(
        tracks=state.tracks.replace(obs=jnp.asarray(obs, state.P.dtype))
    )
    before_count = int(state.window.count)
    out = prune.prune_redundant_states(state, CFG)
    after_count = int(out.window.count)
    assert after_count == before_count - 2
    # involved obs erased, others survive (under permutation)
    assert int(jnp.sum(out.tracks.obs_mask[0])) == 20
    # track cached its triangulation
    assert bool(out.tracks.initialized[0])
    np.testing.assert_allclose(np.asarray(out.tracks.p_f_G[0]), point, atol=0.02)


def test_prune_redundant_noop_small_window():
    state = _filled_state(10)
    out = prune.prune_redundant_states(state, CFG)
    assert int(out.window.count) == 10
    np.testing.assert_allclose(np.asarray(out.P), np.asarray(state.P), atol=1e-9)


def test_prune_empty_archives_removed_states():
    """Removed slots land in the per-frame pruned archive with their
    state_id/time/pose at removal (the pruned_states_ feed, msckf.h:49,:715)."""
    n = CFG.filter.max_cam_states + 3
    state = _filled_state(n)
    state = _add_track(state, 0, 10, list(range(2, n)))
    out = prune.prune_empty_states(state, CFG)
    pm = np.asarray(out.pruned_mask)
    assert pm.sum() == 2  # slots 0,1 removed
    ids = np.asarray(out.pruned_ids)[pm]
    np.testing.assert_array_equal(np.sort(ids), [0, 1])
    # pose at removal == the pre-prune window pose of those slots
    p = np.asarray(out.pruned_p)[pm]
    np.testing.assert_allclose(np.sort(p[:, 0]), [0.0, 0.5], atol=1e-12)
    t = np.asarray(out.pruned_time)[pm]
    np.testing.assert_allclose(np.sort(t), [0.0, 0.05], atol=1e-12)


def test_archive_appends_across_stages():
    """Two successive archives into the same frame buffer append, not
    overwrite (both prune stages of one frame share it)."""
    n = 8
    state = _filled_state(n)
    rm1 = np.zeros((N,), bool); rm1[2] = True
    rm2 = np.zeros((N,), bool); rm2[5] = True
    s1 = prune._archive_removed(state, jnp.asarray(rm1))
    s2 = prune._archive_removed(s1, jnp.asarray(rm2))
    pm = np.asarray(s2.pruned_mask)
    assert pm.sum() == 2
    ids = np.asarray(s2.pruned_ids)[pm]
    np.testing.assert_array_equal(ids, [2, 5])  # append order
    # clear resets
    s3 = prune.clear_frame_archive(s2)
    assert not np.asarray(s3.pruned_mask).any()
    assert (np.asarray(s3.pruned_ids) == -1).all()
