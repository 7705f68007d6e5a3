import numpy as np
import jax
import jax.numpy as jnp

from msckf_mono_tpu.core import triangulate
from msckf_mono_tpu.utils import quat
from msckf_mono_tpu.utils.config import MsckfConfig

CFG = MsckfConfig()
N = CFG.shapes.num_slots


def _make_scene(n_obs=8, seed=0, noise=0.0, point=None):
    """Cameras on a line looking at a point; returns slot-shaped arrays."""
    rng = np.random.default_rng(seed)
    point = np.array([0.5, -0.3, 4.0]) if point is None else np.asarray(point)

    q_CG = np.zeros((N, 4))
    q_CG[:, 0] = 1.0
    p_C_G = np.zeros((N, 3))
    obs = np.zeros((N, 2))
    mask = np.zeros((N,), bool)

    for i in range(n_obs):
        # small rotations, translation along x
        axis = rng.normal(size=3) * 0.02
        angle = np.linalg.norm(axis)
        qw = np.cos(angle / 2)
        qv = axis / max(angle, 1e-12) * np.sin(angle / 2)
        q = np.array([qw, *qv])
        p = np.array([0.3 * i, 0.02 * i, 0.01 * i])
        R = np.asarray(quat.to_rotmat(jnp.asarray(q)))
        pc = R @ (point - p)
        obs[i] = pc[:2] / pc[2] + rng.normal(size=2) * noise
        q_CG[i] = q
        p_C_G[i] = p
        mask[i] = True

    return (
        jnp.asarray(obs),
        jnp.asarray(mask),
        jnp.asarray(q_CG),
        jnp.asarray(p_C_G),
        point,
    )


def test_triangulation_recovers_point():
    obs, mask, q, p, point = _make_scene(n_obs=8)
    p_f, ok = triangulate.initialize_position(obs, mask, q, p, CFG.max_gn_cost_norm)
    assert bool(ok)
    np.testing.assert_allclose(np.asarray(p_f), point, atol=1e-5)


def test_triangulation_noisy():
    obs, mask, q, p, point = _make_scene(n_obs=10, noise=0.002, seed=3)
    p_f, ok = triangulate.initialize_position(obs, mask, q, p, CFG.max_gn_cost_norm)
    assert bool(ok)
    np.testing.assert_allclose(np.asarray(p_f), point, atol=0.2)


def test_triangulation_rejects_behind_camera():
    obs, mask, q, p, point = _make_scene(n_obs=6)
    # Flip observations to simulate a point behind the cameras
    obs_bad = -3.0 * obs
    p_f, ok = triangulate.initialize_position(obs_bad, mask, q, p, CFG.max_gn_cost_norm)
    assert not bool(ok)


def test_check_motion():
    obs, mask, q, p, point = _make_scene(n_obs=8)
    assert bool(triangulate.check_motion(obs, mask, q, p, 0.1))
    # All cameras at the same position: no parallax
    p_static = jnp.zeros_like(p)
    assert not bool(triangulate.check_motion(obs, mask, q, p_static, 0.1))


def test_check_motion_parallel_translation():
    """Translation along the viewing ray produces no parallax."""
    point = np.array([0.0, 0.0, 5.0])
    q_CG = np.zeros((N, 4))
    q_CG[:, 0] = 1.0
    p_C_G = np.zeros((N, 3))
    obs = np.zeros((N, 2))
    mask = np.zeros((N,), bool)
    for i in range(5):
        p = np.array([0.0, 0.0, 0.2 * i])  # along the ray to the point
        pc = point - p
        obs[i] = pc[:2] / pc[2]
        p_C_G[i] = p
        mask[i] = True
    ok = triangulate.check_motion(
        jnp.asarray(obs), jnp.asarray(mask), jnp.asarray(q_CG), jnp.asarray(p_C_G), 0.05
    )
    assert not bool(ok)


def test_triangulation_vmap_with_invalid_rows():
    obs, mask, q, p, point = _make_scene(n_obs=8)
    obs_b = jnp.stack([obs, jnp.zeros_like(obs)])
    mask_b = jnp.stack([mask, jnp.zeros_like(mask)])
    f = jax.jit(
        jax.vmap(
            lambda o, m: triangulate.initialize_position(o, m, q, p, CFG.max_gn_cost_norm)
        )
    )
    p_f, ok = f(obs_b, mask_b)
    assert bool(ok[0]) and not bool(ok[1])
    np.testing.assert_allclose(np.asarray(p_f[0]), point, atol=1e-5)
