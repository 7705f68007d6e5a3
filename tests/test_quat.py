import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation

from msckf_mono_tpu.utils import quat


def _rand_quat(rng, n=()):
    q = rng.normal(size=n + (4,))
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def _scipy_rot(q_wxyz):
    # scipy uses xyzw
    return Rotation.from_quat(np.roll(np.asarray(q_wxyz), -1, axis=-1))


def test_to_rotmat_matches_scipy():
    rng = np.random.default_rng(0)
    q = _rand_quat(rng, (32,))
    ours = np.asarray(quat.to_rotmat(jnp.asarray(q)))
    ref = _scipy_rot(q).as_matrix()
    np.testing.assert_allclose(ours, ref, atol=1e-12)


def test_mul_matches_scipy():
    rng = np.random.default_rng(1)
    a, b = _rand_quat(rng, (16,)), _rand_quat(rng, (16,))
    ours = np.asarray(quat.mul(jnp.asarray(a), jnp.asarray(b)))
    ref = (_scipy_rot(a) * _scipy_rot(b)).as_quat()  # xyzw
    ref = np.roll(ref, 1, axis=-1)
    # sign ambiguity
    sign = np.sign(np.sum(ours * ref, axis=-1, keepdims=True))
    np.testing.assert_allclose(ours, ref * sign, atol=1e-12)


def test_rotate_matches_matrix():
    rng = np.random.default_rng(2)
    q = _rand_quat(rng, (8,))
    v = rng.normal(size=(8, 3))
    r1 = np.asarray(quat.rotate(jnp.asarray(q), jnp.asarray(v)))
    r2 = np.einsum("nij,nj->ni", np.asarray(quat.to_rotmat(jnp.asarray(q))), v)
    np.testing.assert_allclose(r1, r2, atol=1e-12)


def test_from_rotmat_roundtrip():
    rng = np.random.default_rng(3)
    q = _rand_quat(rng, (64,))
    r = quat.to_rotmat(jnp.asarray(q))
    q2 = np.asarray(quat.from_rotmat(r))
    sign = np.sign(np.sum(q2 * q, axis=-1, keepdims=True))
    np.testing.assert_allclose(q2 * sign, q, atol=1e-9)


def test_from_two_vectors():
    rng = np.random.default_rng(4)
    a = rng.normal(size=(16, 3))
    b = rng.normal(size=(16, 3))
    q = quat.from_two_vectors(jnp.asarray(a), jnp.asarray(b))
    rotated = np.asarray(quat.rotate(q, jnp.asarray(a / np.linalg.norm(a, axis=-1, keepdims=True))))
    bn = b / np.linalg.norm(b, axis=-1, keepdims=True)
    np.testing.assert_allclose(rotated, bn, atol=1e-9)


def test_angular_distance():
    rng = np.random.default_rng(5)
    q1 = _rand_quat(rng, (16,))
    q2 = _rand_quat(rng, (16,))
    ours = np.asarray(quat.angular_distance(jnp.asarray(q1), jnp.asarray(q2)))
    ref = (_scipy_rot(q1).inv() * _scipy_rot(q2)).magnitude()
    np.testing.assert_allclose(ours, ref, atol=1e-9)


def test_integrate_rk5_constant_rate():
    # Constant angular velocity for time dt should match the closed form
    # q_new = q ⊗ exp-map in the body frame convention used by the filter.
    omega = np.array([0.3, -0.2, 0.5])
    dt = 0.005
    q0 = np.array([1.0, 0.0, 0.0, 0.0])
    import jax

    @jax.jit
    def run(q):
        return jax.lax.fori_loop(
            0, 200, lambda _, qq: quat.integrate_rk5(qq, jnp.asarray(omega), dt), q
        )

    q = run(jnp.asarray(q0))
    # After 1s at constant omega: total rotation angle |omega|
    angle = np.linalg.norm(omega) * 1.0
    got_angle = 2 * np.arccos(np.clip(abs(float(q[0])), -1, 1))
    np.testing.assert_allclose(got_angle, angle, atol=1e-6)


def test_build_update_quat_small_angle():
    d = np.array([1e-3, -2e-3, 0.5e-3])
    q = np.asarray(quat.build_update_quat(jnp.asarray(d)))
    # small-angle: w ~ 1, vec ~ -d/2
    np.testing.assert_allclose(q[1:], -d / 2, rtol=1e-5)
    assert abs(np.linalg.norm(q) - 1) < 1e-12
