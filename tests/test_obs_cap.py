"""Observation-width caps (round 5): capped row math must be EXACT whenever a
track's observation count fits the cap, and the fused two-call carry chain
must reproduce the single concatenated row stack bit-for-bit.

The caps exist because the prune path's candidates carry exactly 2 involved
observations (measured p99.9, tools/measure_row_stats.py) while paying the
full (2N-3)-row buffer — see ShapeConfig.marg_obs_cap/prune_obs_cap.
"""

import dataclasses
import os
import sys

import numpy as np
import jax.numpy as jnp

from msckf_mono_tpu.core import update as upd
from msckf_mono_tpu.utils.config import MsckfConfig

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from test_update import CFG, _observe, _state_with_window  # noqa: E402


def test_capped_rows_exact_when_under_cap():
    state = _state_with_window(8)
    point = np.array([0.5, -0.3, 4.0])
    obs, mask = _observe(state, point, 6, noise=1e-4)
    g = state.imu.g

    H_full, r_full, rv_full, _ = upd.track_projected_rows(
        obs, mask, jnp.asarray(point), state.window, g, CFG
    )
    for cap in (6, 8, 12):
        H_c, r_c, rv_c, _ = upd.track_projected_rows(
            obs, mask, jnp.asarray(point), state.window, g, CFG, m_cap=cap
        )
        R = 2 * cap - 3
        np.testing.assert_array_equal(np.asarray(H_c), np.asarray(H_full)[:R])
        np.testing.assert_array_equal(np.asarray(r_c), np.asarray(r_full)[:R])
        np.testing.assert_array_equal(np.asarray(rv_c), np.asarray(rv_full)[:R])
        # all information lives in the first 2m-3 rows either way
        assert np.all(np.asarray(H_full)[R:] == 0)


def test_capped_rows_drop_newest_obs_beyond_cap():
    state = _state_with_window(10)
    point = np.array([0.5, -0.3, 4.0])
    obs, mask = _observe(state, point, 9, noise=1e-4)
    g = state.imu.g

    cap = 5
    H_c, r_c, rv_c, _ = upd.track_projected_rows(
        obs, mask, jnp.asarray(point), state.window, g, CFG, m_cap=cap
    )
    # Equivalent uncapped computation on the first `cap` observations only.
    mask5 = jnp.asarray(np.asarray(mask) & (np.arange(mask.shape[0]) < cap))
    H_e, r_e, rv_e, _ = upd.track_projected_rows(
        obs, mask5, jnp.asarray(point), state.window, g, CFG
    )
    R = 2 * cap - 3
    np.testing.assert_allclose(
        np.asarray(H_c), np.asarray(H_e)[:R], rtol=0, atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(r_c), np.asarray(r_e)[:R], rtol=0, atol=1e-12
    )
    assert int(np.asarray(rv_c).sum()) == R


def _staged_sets(seed=3):
    """Two small staged sets observing one window, as (obs, mask, p, ok)."""
    rng = np.random.default_rng(seed)
    state = _state_with_window(8, seed=seed)
    N = state.window.q_CG.shape[0]
    sets = []
    for s, n_tracks, n_obs in ((0, 4, 7), (1, 8, 2)):
        obs_l, mask_l, p_l, ok_l = [], [], [], []
        for t in range(n_tracks):
            point = np.array([0.4, -0.2, 3.5]) + rng.normal(size=3) * 0.2
            o, m = _observe(state, point, n_obs + (t % 2), noise=1e-3,
                            seed=seed * 100 + s * 10 + t)
            obs_l.append(o)
            mask_l.append(m)
            p_l.append(point)
            ok_l.append(t != 1)  # one disabled track per set
        sets.append((
            jnp.stack(obs_l), jnp.stack(mask_l),
            jnp.asarray(np.stack(p_l), state.P.dtype),
            jnp.asarray(np.asarray(ok_l)),
        ))
    return state, sets


def test_fused_carry_chain_matches_concatenated_stack():
    state, (set_a, set_b) = _staged_sets()
    g = state.imu.g
    sigma2 = jnp.asarray(CFG.u_var_prime, state.P.dtype)

    obs = jnp.concatenate([set_a[0], set_b[0]])
    mask = jnp.concatenate([set_a[1], set_b[1]])
    p = jnp.concatenate([set_a[2], set_b[2]])
    ok = jnp.concatenate([set_a[3], set_b[3]])
    H1, r1, gate1, present1, nd1 = upd.gated_row_stack(
        obs, mask, p, ok, state.window, g, state.P, sigma2, CFG
    )[:5]

    gate_a, present_a, carry = upd.gated_row_stack(
        set_a[0], set_a[1], set_a[2], set_a[3], state.window, g, state.P,
        sigma2, CFG, return_carry=True,
    )
    H2, r2, gate_b, present_b, nd2 = upd.gated_row_stack(
        set_b[0], set_b[1], set_b[2], set_b[3], state.window, g, state.P,
        sigma2, CFG, carry=carry,
    )[:5]

    np.testing.assert_array_equal(np.asarray(H1), np.asarray(H2))
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))
    np.testing.assert_array_equal(
        np.asarray(gate1), np.concatenate([gate_a, gate_b])
    )
    np.testing.assert_array_equal(
        np.asarray(present1), np.concatenate([present_a, present_b])
    )
    assert int(nd1) == int(nd2)


def test_capped_stack_exact_when_obs_fit_and_counts_overflow_otherwise():
    state, (set_a, set_b) = _staged_sets()
    g = state.imu.g
    sigma2 = jnp.asarray(CFG.u_var_prime, state.P.dtype)

    # set_b tracks have 2-3 obs; cap 4 is exact for them.
    H0, r0, gate0, _p0, nd0 = upd.gated_row_stack(
        set_b[0], set_b[1], set_b[2], set_b[3], state.window, g, state.P,
        sigma2, CFG
    )[:5]
    H4, r4, gate4, _p4, nd4 = upd.gated_row_stack(
        set_b[0], set_b[1], set_b[2], set_b[3], state.window, g, state.P,
        sigma2, CFG, m_cap=4
    )[:5]
    np.testing.assert_array_equal(np.asarray(gate0), np.asarray(gate4))
    np.testing.assert_allclose(np.asarray(H0), np.asarray(H4), atol=1e-12)
    np.testing.assert_allclose(np.asarray(r0), np.asarray(r4), atol=1e-12)
    assert int(nd0) == int(nd4) == 0

    # set_a tracks have 7-8 obs; cap 4 loses rows and must say so.
    _Ha, _ra, _ga, _pa, nd_capped = upd.gated_row_stack(
        set_a[0], set_a[1], set_a[2], set_a[3], state.window, g, state.P,
        sigma2, CFG, m_cap=4
    )[:5]
    assert int(nd_capped) > 0


def test_fused_step_with_caps_runs_and_matches_uncapped_closely():
    """End-to-end fused step with serving caps: state stays finite and close
    to the uncapped fused step on a world where the caps are inactive."""
    import jax

    from msckf_mono_tpu.core import filter as mf
    from msckf_mono_tpu.core.init import ground_truth_init
    from msckf_mono_tpu.core.types import init_filter_state
    from msckf_mono_tpu.data import synthetic

    base = dataclasses.replace(
        MsckfConfig(),
        filter=dataclasses.replace(MsckfConfig().filter, fused_updates=True),
    )
    capped = dataclasses.replace(
        base, shapes=dataclasses.replace(base.shapes, prune_obs_cap=6,
                                         marg_obs_cap=26),
    )
    seq = synthetic.generate(base, n_frames=40, seed=0, pixel_noise=0.5)
    frames = synthetic.to_frame_inputs(seq, jnp.float32)
    imu = ground_truth_init(
        p_I_G=[5.0, 0.0, 0.0], q_IG=[1, 0, 0, 0],
        v_I_G=[0.0, 5.0 * 0.35, 0.28], b_g=seq.b_g, b_a=seq.b_a,
        dtype=jnp.float32,
    )
    s0 = init_filter_state(base, imu, dtype=jnp.float32)
    fin_b, _ = jax.jit(lambda s, f: mf.run_sequence(s, f, base))(s0, frames)
    fin_c, _ = jax.jit(lambda s, f: mf.run_sequence(s, f, capped))(s0, frames)
    pb = np.asarray(fin_b.imu.p_I_G)
    pc = np.asarray(fin_c.imu.p_I_G)
    assert np.isfinite(pc).all()
    # marg cap 26 >= any track's obs; prune cap 6 >= the <=2-slot involved
    # sets of this world: identical information, tiny fp-ordering drift only.
    np.testing.assert_allclose(pc, pb, atol=5e-4)


def test_chunk_override_is_bitwise_identical():
    """gated_row_stack(chunk=...) must reproduce the default-chunk stack
    bit-for-bit: rows accumulate in global staged order via the carried
    count, so the chunk size only changes the scan step granularity
    (ShapeConfig.prune_chunk lets the capped prune sweep run in one step)."""
    state, (set_a, set_b) = _staged_sets()
    g = state.imu.g
    sigma2 = jnp.asarray(CFG.u_var_prime, state.P.dtype)

    obs = jnp.concatenate([set_a[0], set_b[0]])
    mask = jnp.concatenate([set_a[1], set_b[1]])
    p = jnp.concatenate([set_a[2], set_b[2]])
    ok = jnp.concatenate([set_a[3], set_b[3]])
    S = int(obs.shape[0])

    base = upd.gated_row_stack(
        obs, mask, p, ok, state.window, g, state.P, sigma2, CFG
    )
    for chunk in (2, S):
        alt = upd.gated_row_stack(
            obs, mask, p, ok, state.window, g, state.P, sigma2, CFG,
            chunk=chunk,
        )
        for a, b in zip(base[:5], alt[:5]):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # chunk=1 differs only at the ULP level (vmap-over-1 lowers the per-track
    # math slightly differently); content and gates are the same
    alt1 = upd.gated_row_stack(
        obs, mask, p, ok, state.window, g, state.P, sigma2, CFG, chunk=1
    )
    np.testing.assert_allclose(np.asarray(base[0]), np.asarray(alt1[0]),
                               atol=1e-12)
    np.testing.assert_array_equal(np.asarray(base[2]), np.asarray(alt1[2]))
