"""finish() must residualize EVERY remaining eligible track.

The reference force-residualizes all remaining tracks at sequence end
(/root/reference/include/msckf_mono/msckf.h:765-807); round-1 finish() did
one <=max_staged pass and dropped the rest. This builds a state with far more
live tracks than one staging buffer holds and asserts all are consumed.
"""

import numpy as np
import jax.numpy as jnp

from msckf_mono_tpu.core import filter as mf
from msckf_mono_tpu.core.types import init_filter_state
from msckf_mono_tpu.utils import quat
from msckf_mono_tpu.utils.config import MsckfConfig

CFG = MsckfConfig()
N = CFG.shapes.num_slots
M = CFG.shapes.max_tracks
D = CFG.shapes.state_dim


def _state_with_many_tracks(n_tracks, n_obs=6, seed=0, dtype=jnp.float64):
    rng = np.random.default_rng(seed)
    state = init_filter_state(CFG, dtype=dtype)

    q = np.zeros((N, 4))
    q[:, 0] = 1.0
    p = np.zeros((N, 3))
    valid = np.zeros((N,), bool)
    for i in range(n_obs + 2):
        p[i] = [0.4 * i, 0.03 * i, 0.0]
        valid[i] = True
    window = state.window.replace(
        q_CG=jnp.asarray(q, dtype),
        p_C_G=jnp.asarray(p, dtype),
        valid=jnp.asarray(valid),
        state_id=jnp.where(jnp.asarray(valid), jnp.arange(N), -1),
    )
    Dv = 15 + 6 * (n_obs + 2)
    X = rng.normal(size=(Dv, Dv))
    Pv = X @ X.T * 1e-7 + np.eye(Dv) * 1e-5
    P = np.zeros((D, D))
    P[:Dv, :Dv] = Pv
    state = state.replace(window=window, P=jnp.asarray(P, dtype))

    # n_tracks well-observed features spread in front of the cameras
    obs = np.zeros((M, N, 2))
    obs_mask = np.zeros((M, N), bool)
    fid = np.full((M,), -1, np.int32)
    active = np.zeros((M,), bool)
    for t in range(n_tracks):
        point = np.array([
            0.8 * rng.uniform(-1, 1), 0.8 * rng.uniform(-1, 1), 5.0 + 2 * rng.uniform()
        ])
        for i in range(n_obs):
            R = np.asarray(quat.to_rotmat(jnp.asarray(q[i], dtype)))
            pc = R @ (point - p[i])
            obs[t, i] = pc[:2] / pc[2] + rng.normal(size=2) * 1e-4
            obs_mask[t, i] = True
        fid[t] = t
        active[t] = True
    tracks = state.tracks.replace(
        obs=jnp.asarray(obs, dtype),
        obs_mask=jnp.asarray(obs_mask),
        feature_id=jnp.asarray(fid),
        active=jnp.asarray(active),
    )
    return state.replace(tracks=tracks)


def test_finish_consumes_all_tracks():
    n_tracks = 100
    assert n_tracks > CFG.shapes.max_staged  # must take several passes
    state = _state_with_many_tracks(n_tracks)
    staged_before = int(state.diag.staged_overflow)

    out = mf.finish(state, CFG)

    # every eligible track consumed, none dropped
    assert int(jnp.sum(out.tracks.active)) == 0
    assert int(out.diag.staged_overflow) == staged_before == 0
    # they were actually residualized, not just erased
    assert int(out.num_residualized) == n_tracks
    assert np.all(np.isfinite(np.asarray(out.P)))


def test_finish_short_tracks_not_staged():
    """Tracks below min_track_length are ineligible and stay out of the updates
    (the reference stages them but marginalize's DoF gate drops them; we gate
    at staging — same net effect, no wasted passes)."""
    state = _state_with_many_tracks(10, n_obs=CFG.filter.min_track_length - 1)
    out = mf.finish(state, CFG)
    assert int(out.num_residualized) == 0
