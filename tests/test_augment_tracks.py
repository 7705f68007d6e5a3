import numpy as np
import jax
import jax.numpy as jnp

from msckf_mono_tpu.core import augment, tracks
from msckf_mono_tpu.core.types import init_filter_state, init_imu_state
from msckf_mono_tpu.utils import quat
from msckf_mono_tpu.utils.config import MsckfConfig

CFG = MsckfConfig()
F = CFG.shapes.max_features_per_frame


def _features(ids, uvs=None):
    n = len(ids)
    uv = np.zeros((F, 2))
    if n and uvs is not None:
        uv[:n] = uvs
    elif n:
        uv[:n] = np.arange(2 * n).reshape(n, 2) * 0.01
    idarr = np.full((F,), -1, np.int32)
    idarr[:n] = ids
    valid = np.zeros((F,), bool)
    valid[:n] = True
    return jnp.asarray(uv), jnp.asarray(idarr), jnp.asarray(valid)


def test_augment_pose_and_covariance():
    cfg = CFG
    rng = np.random.default_rng(0)
    qv = rng.normal(size=4)
    qv /= np.linalg.norm(qv)
    imu = init_imu_state(
        q_IG=qv, p_I_G=[1.0, 2.0, 3.0], v_I_G=[0.1, 0.2, 0.3], dtype=jnp.float64
    )
    state = init_filter_state(cfg, imu, dtype=jnp.float64)
    state = augment.augment_state(state, 1, 0.1, cfg)

    # Window bookkeeping
    assert int(state.window.count) == 1
    assert int(state.window.state_id[0]) == 1

    # Pose formulas (msckf.h:152-160)
    q_CI = jnp.asarray(cfg.camera.q_CI, jnp.float64)
    p_C_I = jnp.asarray(cfg.camera.p_C_I, jnp.float64)
    expect_q = np.asarray(quat.normalize(quat.mul(q_CI, imu.q_IG)))
    got_q = np.asarray(state.window.q_CG[0])
    sign = np.sign(np.dot(expect_q, got_q))
    np.testing.assert_allclose(got_q * sign, expect_q, atol=1e-12)
    expect_p = np.asarray(imu.p_I_G + quat.rotate(quat.inverse(imu.q_IG), p_C_I))
    np.testing.assert_allclose(np.asarray(state.window.p_C_G[0]), expect_p, atol=1e-12)

    # Covariance: new block = [J P15; ...] with J per msckf.h:180-184
    P = np.asarray(state.P)
    np.testing.assert_allclose(P, P.T, atol=1e-14)
    J = np.zeros((6, 15))
    J[0:3, 0:3] = np.asarray(quat.to_rotmat(q_CI))
    J[3:6, 0:3] = np.asarray(quat.skew(quat.rotate(quat.inverse(imu.q_IG), p_C_I)))
    J[3:6, 12:15] = np.eye(3)
    P0 = np.diag(cfg.initial_imu_covar_diag())
    np.testing.assert_allclose(P[15:21, 0:15], J @ P0, atol=1e-12)
    np.testing.assert_allclose(P[15:21, 15:21], J @ P0 @ J.T, atol=1e-12)
    # beyond the new block everything stays zero
    assert np.all(P[21:, :] == 0)


def test_augment_repeated_fills_slots():
    cfg = CFG
    state = init_filter_state(cfg, dtype=jnp.float64)
    f = jax.jit(lambda s, i: augment.augment_state(s, i, 0.05 * i, cfg))
    for i in range(5):
        state = f(state, i)
    assert int(state.window.count) == 5
    assert list(np.asarray(state.window.state_id[:5])) == [0, 1, 2, 3, 4]


def test_track_lifecycle():
    cfg = CFG
    state = init_filter_state(cfg, dtype=jnp.float64)

    # frame 1: augment, no tracked, two new features
    state = augment.augment_state(state, 1, 0.0, cfg)
    uv, ids, valid = _features([], [])
    state, staged = tracks.update_tracks(state, uv, ids, valid, cfg)
    assert not bool(jnp.any(staged.valid))
    uv, ids, valid = _features([10, 11])
    state = tracks.add_features(state, uv, ids, valid, cfg)
    assert int(jnp.sum(state.tracks.active)) == 2

    # frame 2: both tracked
    state = augment.augment_state(state, 2, 0.05, cfg)
    uv, ids, valid = _features([10, 11])
    state, staged = tracks.update_tracks(state, uv, ids, valid, cfg)
    assert not bool(jnp.any(staged.valid))
    lengths = np.asarray(state.tracks.lengths)
    active = np.asarray(state.tracks.active)
    assert sorted(lengths[active]) == [2, 2]

    # frames 3..6: only 10 survives; 11 dies at frame 3 but len 2 < min_track_length -> dropped silently
    for k in range(3, 7):
        state = augment.augment_state(state, k, 0.05 * k, cfg)
        uv, ids, valid = _features([10])
        state, staged = tracks.update_tracks(state, uv, ids, valid, cfg)
        if k == 3:
            assert not bool(jnp.any(staged.valid))  # too short to stage
            assert int(jnp.sum(state.tracks.active)) == 1

    # frame 7: 10 dies with 6 observations >= min_track_length=5 -> staged
    state = augment.augment_state(state, 7, 0.35, cfg)
    uv, ids, valid = _features([], [])
    state, staged = tracks.update_tracks(state, uv, ids, valid, cfg)
    assert int(jnp.sum(staged.valid)) == 1
    assert int(staged.feature_id[0]) == 10
    assert int(jnp.sum(staged.obs_mask[0])) == 6
    assert int(jnp.sum(state.tracks.active)) == 0


def test_add_features_skips_duplicates():
    cfg = CFG
    state = init_filter_state(cfg, dtype=jnp.float64)
    state = augment.augment_state(state, 1, 0.0, cfg)
    uv, ids, valid = _features([5, 6])
    state = tracks.add_features(state, uv, ids, valid, cfg)
    uv, ids, valid = _features([6, 7])
    state = tracks.add_features(state, uv, ids, valid, cfg)
    active_ids = sorted(np.asarray(state.tracks.feature_id)[np.asarray(state.tracks.active)])
    assert active_ids == [5, 6, 7]


def test_obs_land_in_newest_slot():
    cfg = CFG
    state = init_filter_state(cfg, dtype=jnp.float64)
    state = augment.augment_state(state, 1, 0.0, cfg)
    uv, ids, valid = _features([42], [[0.1, 0.2]])
    state = tracks.add_features(state, uv, ids, valid, cfg)
    state = augment.augment_state(state, 2, 0.05, cfg)
    uv, ids, valid = _features([42], [[0.3, 0.4]])
    state, _ = tracks.update_tracks(state, uv, ids, valid, cfg)
    row = int(np.flatnonzero(np.asarray(state.tracks.active))[0])
    np.testing.assert_allclose(np.asarray(state.tracks.obs[row, 0]), [0.1, 0.2])
    np.testing.assert_allclose(np.asarray(state.tracks.obs[row, 1]), [0.3, 0.4])
    assert list(np.asarray(state.tracks.obs_mask[row, :3])) == [True, True, False]
