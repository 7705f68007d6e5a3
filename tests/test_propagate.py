import numpy as np
import jax
import jax.numpy as jnp
from scipy.linalg import expm as scipy_expm

from msckf_mono_tpu.core import propagate as prop
from msckf_mono_tpu.core.types import init_filter_state, init_imu_state
from msckf_mono_tpu.ops.expm import expm_taylor
from msckf_mono_tpu.utils.config import MsckfConfig
from msckf_mono_tpu.utils import quat


CFG = MsckfConfig()


def test_expm_matches_scipy():
    rng = np.random.default_rng(0)
    for scale in [0.01, 0.1, 0.5, 1.0]:
        a = rng.normal(size=(15, 15)) * scale
        ours = np.asarray(expm_taylor(jnp.asarray(a)))
        ref = scipy_expm(a)
        np.testing.assert_allclose(ours, ref, atol=1e-10, rtol=1e-8)


def test_F_structure():
    imu = init_imu_state(dtype=jnp.float64)
    omega = jnp.asarray([0.1, -0.2, 0.3], jnp.float64)
    a = jnp.asarray([0.5, 9.8, -0.1], jnp.float64)
    F = np.asarray(prop.calc_F(imu, omega, a))
    # Identity q: C_IG = I
    np.testing.assert_allclose(F[0:3, 0:3], -np.asarray(quat.skew(omega)))
    np.testing.assert_allclose(F[0:3, 3:6], -np.eye(3))
    np.testing.assert_allclose(F[6:9, 0:3], -np.asarray(quat.skew(a)))
    np.testing.assert_allclose(F[6:9, 9:12], -np.eye(3))
    np.testing.assert_allclose(F[12:15, 6:9], np.eye(3))
    # all other blocks zero
    assert np.count_nonzero(F) == np.count_nonzero(F[0:3, 0:3]) + 3 + np.count_nonzero(F[6:9, 0:3]) + 3 + 3


def _propagate_n(state, omega, a, dt, n, cfg):
    @jax.jit
    def run(s):
        def body(_, ss):
            return prop.propagate(ss, omega, a, dt, cfg)
        return jax.lax.fori_loop(0, n, body, s)
    return run(state)


def test_propagate_static_imu():
    """At rest with perfect gravity cancellation the pose must not move."""
    cfg = CFG
    imu = init_imu_state(dtype=jnp.float64)
    state = init_filter_state(cfg, imu, dtype=jnp.float64)
    omega = jnp.zeros(3, jnp.float64)
    a = jnp.asarray([0.0, 0.0, 9.81], jnp.float64)  # measured specific force

    state = _propagate_n(state, omega, a, 0.005, 100, cfg)

    np.testing.assert_allclose(np.asarray(state.imu.p_I_G), 0.0, atol=1e-10)
    np.testing.assert_allclose(np.asarray(state.imu.v_I_G), 0.0, atol=1e-10)
    np.testing.assert_allclose(np.asarray(state.imu.q_IG), [1, 0, 0, 0], atol=1e-10)
    # Covariance must stay symmetric PSD and grow
    P = np.asarray(state.P[:15, :15])
    np.testing.assert_allclose(P, P.T, atol=1e-12)
    assert np.all(np.linalg.eigvalsh(P) > -1e-15)
    assert P[6, 6] > cfg.noise.v_var_init  # velocity uncertainty grew


def test_propagate_matches_dead_reckoning():
    """Constant acceleration in the world frame integrates to ~0.5 a t^2."""
    cfg = CFG
    imu = init_imu_state(dtype=jnp.float64)
    state = init_filter_state(cfg, imu, dtype=jnp.float64)
    omega = jnp.zeros(3, jnp.float64)
    a_world = np.array([1.0, 0.0, 0.0])
    a_meas = jnp.asarray(a_world + np.array([0.0, 0.0, 9.81]), jnp.float64)

    dt, n = 0.005, 200  # 1 second
    state = _propagate_n(state, omega, a_meas, dt, n, cfg)

    t = dt * n
    np.testing.assert_allclose(np.asarray(state.imu.v_I_G), a_world * t, atol=1e-9)
    # p uses previous v (reference msckf.h:1465): p = 0.5 a t^2 - 0.5 a dt t
    expected_p = 0.5 * a_world * t * t - 0.5 * a_world * dt * t
    np.testing.assert_allclose(np.asarray(state.imu.p_I_G), expected_p, atol=1e-9)


def test_propagate_cross_covariance():
    """Cross-covariance block must transform as Phi @ P_0c."""
    cfg = CFG
    state = init_filter_state(cfg, dtype=jnp.float64)
    rng = np.random.default_rng(1)
    D = cfg.shapes.state_dim
    X = rng.normal(size=(D, D))
    P = X @ X.T * 1e-4
    state = state.replace(P=jnp.asarray(P))

    omega = jnp.asarray([0.05, 0.02, -0.01], jnp.float64)
    a = jnp.asarray([0.1, 0.2, 9.7], jnp.float64)
    new = prop.propagate(state, omega, a, 0.005, cfg)

    Pn = np.asarray(new.P)
    # Phi recoverable: P0c_new = Phi @ P0c  =>  Phi = P0c_new @ pinv(P0c)
    P0c = P[0:15, 15:]
    Phi = Pn[0:15, 15:] @ np.linalg.pinv(P0c)
    # check consistency with the corner block update
    G = np.asarray(prop.calc_G(state.imu, jnp.float64))
    Q = np.diag(cfg.q_imu_diag())
    expected00 = Phi @ (P[:15, :15] + G @ Q @ G.T * 0.005) @ Phi.T
    expected00 = 0.5 * (expected00 + expected00.T)
    np.testing.assert_allclose(Pn[:15, :15], expected00, rtol=1e-6, atol=1e-10)
    # lower-left mirrors upper-right
    np.testing.assert_allclose(Pn[15:, 0:15], Pn[0:15, 15:].T, atol=1e-12)
    # camera-camera block untouched
    np.testing.assert_allclose(Pn[15:, 15:], P[15:, 15:], atol=1e-12)


def test_propagate_zero_dt_is_identity():
    cfg = CFG
    state = init_filter_state(cfg, dtype=jnp.float64)
    omega = jnp.asarray([0.1, 0.2, 0.3], jnp.float64)
    a = jnp.asarray([1.0, 2.0, 3.0], jnp.float64)
    new = prop.propagate(state, omega, a, 0.0, cfg)
    np.testing.assert_allclose(np.asarray(new.P), np.asarray(state.P), atol=1e-14)
    np.testing.assert_allclose(np.asarray(new.imu.q_IG), np.asarray(state.imu.q_IG), atol=1e-14)


def test_propagate_jits_and_vmaps():
    cfg = CFG
    state = init_filter_state(cfg, dtype=jnp.float32)
    batch = jax.tree_util.tree_map(lambda x: jnp.stack([x] * 4), state)
    omega = jnp.zeros((4, 3))
    a = jnp.tile(jnp.asarray([0.0, 0.0, 9.81]), (4, 1))
    dt = jnp.full((4,), 0.005)

    f = jax.jit(jax.vmap(lambda s, o, ac, d: prop.propagate(s, o, ac, d, cfg)))
    out = f(batch, omega, a, dt)
    assert out.P.shape == (4, cfg.shapes.state_dim, cfg.shapes.state_dim)
    assert np.all(np.isfinite(np.asarray(out.P)))


def test_propagate_block_matches_sequential():
    """The composed one-shot block (core/propagate.propagate_block) must agree
    with scanning propagate() per sample — same math, composed exactly."""
    import jax

    from msckf_mono_tpu.core.propagate import propagate, propagate_block
    from msckf_mono_tpu.core.types import init_filter_state
    from msckf_mono_tpu.core.update import apply_correction

    cfg = MsckfConfig()
    rng = np.random.default_rng(0)
    state = init_filter_state(cfg, dtype=jnp.float64)
    # make the covariance non-trivial and the nulls differ from the state
    D = cfg.shapes.state_dim
    X = rng.normal(size=(D, D))
    state = state.replace(P=jnp.asarray(X @ X.T * 1e-6 + np.eye(D) * 1e-5))
    state = apply_correction(state, jnp.asarray(rng.normal(size=D) * 1e-3), cfg)

    K = 10
    omegas = jnp.asarray(rng.normal(size=(K, 3)) * 0.3)
    accs = jnp.asarray(rng.normal(size=(K, 3)) * 2.0 + np.array([0, 0, 9.81]))
    dts = jnp.asarray(np.r_[np.full(K - 2, 0.005), 0.0, 0.0])  # incl. padding

    seq_state = state
    for k in range(K):
        seq_state = propagate(seq_state, omegas[k], accs[k], dts[k], cfg)

    blk_state = propagate_block(state, omegas, accs, dts, cfg)

    np.testing.assert_allclose(
        np.asarray(blk_state.imu.q_IG), np.asarray(seq_state.imu.q_IG), atol=1e-14
    )
    np.testing.assert_allclose(
        np.asarray(blk_state.imu.p_I_G), np.asarray(seq_state.imu.p_I_G), atol=1e-14
    )
    np.testing.assert_allclose(
        np.asarray(blk_state.P), np.asarray(seq_state.P), rtol=1e-10, atol=1e-14
    )
