"""Quaternion / SO(3) primitives.

Hamilton convention, stored as ``[w, x, y, z]`` along the last axis. All ops are
pure jnp functions that broadcast over leading (batch) axes, so they compose with
``vmap``/``scan`` without modification.

Semantics match Eigen's ``Quaternion`` as used by the reference implementation
(/root/reference/include/msckf_mono/msckf.h, matrix_utils.h):

* ``to_rotmat(q) @ v  ==  q * v`` (Eigen's ``q.toRotationMatrix()*v``),
* ``mul(a, b)`` is Eigen's ``a * b``,
* ``inverse`` of a unit quaternion is the conjugate.

The reference integrates the quaternion kinematics in the JPL-style stacked form
``y = [-x, -y, -z, w]`` (msckf.h:1425-1467); :func:`integrate_rk5` mirrors that
computation exactly (same fixed RK coefficients) for numerical parity.
"""

from __future__ import annotations

import jax.numpy as jnp


def skew(v):
    """Skew-symmetric matrix of a 3-vector; broadcasts over leading axes.

    Matches ``vectorToSkewSymmetric`` (reference matrix_utils.h:8-17).
    """
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )


def identity(dtype=jnp.float32):
    return jnp.array([1.0, 0.0, 0.0, 0.0], dtype=dtype)


def normalize(q):
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def conjugate(q):
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


# Unit-quaternion inverse == conjugate (Eigen ``q.inverse()`` for unit q).
inverse = conjugate


def mul(a, b):
    """Hamilton product ``a ⊗ b`` (Eigen ``a * b``)."""
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def to_rotmat(q):
    """Rotation matrix R with ``R @ v == q * v`` (Eigen ``toRotationMatrix``)."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    r = jnp.stack(
        [
            jnp.stack([1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)], axis=-1),
            jnp.stack([2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)], axis=-1),
            jnp.stack([2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)], axis=-1),
        ],
        axis=-2,
    )
    return r


def rotate(q, v):
    """Rotate vector(s) v by quaternion q (== to_rotmat(q) @ v), cheap form."""
    qv = q[..., 1:4]
    uv = jnp.cross(qv, v)
    uuv = jnp.cross(qv, uv)
    return v + 2.0 * (q[..., 0:1] * uv + uuv)


def from_rotmat(r):
    """Quaternion from rotation matrix (Shepperd's method, branch-free)."""
    m00, m01, m02 = r[..., 0, 0], r[..., 0, 1], r[..., 0, 2]
    m10, m11, m12 = r[..., 1, 0], r[..., 1, 1], r[..., 1, 2]
    m20, m21, m22 = r[..., 2, 0], r[..., 2, 1], r[..., 2, 2]
    tr = m00 + m11 + m22

    # Four candidate computations; pick the numerically best via where-chains.
    qw0 = jnp.sqrt(jnp.maximum(1.0 + tr, 1e-30)) / 2.0
    q0 = jnp.stack(
        [qw0, (m21 - m12) / (4 * qw0), (m02 - m20) / (4 * qw0), (m10 - m01) / (4 * qw0)],
        axis=-1,
    )
    qx1 = jnp.sqrt(jnp.maximum(1.0 + m00 - m11 - m22, 1e-30)) / 2.0
    q1 = jnp.stack(
        [(m21 - m12) / (4 * qx1), qx1, (m01 + m10) / (4 * qx1), (m02 + m20) / (4 * qx1)],
        axis=-1,
    )
    qy2 = jnp.sqrt(jnp.maximum(1.0 - m00 + m11 - m22, 1e-30)) / 2.0
    q2 = jnp.stack(
        [(m02 - m20) / (4 * qy2), (m01 + m10) / (4 * qy2), qy2, (m12 + m21) / (4 * qy2)],
        axis=-1,
    )
    qz3 = jnp.sqrt(jnp.maximum(1.0 - m00 - m11 + m22, 1e-30)) / 2.0
    q3 = jnp.stack(
        [(m10 - m01) / (4 * qz3), (m02 + m20) / (4 * qz3), (m12 + m21) / (4 * qz3), qz3],
        axis=-1,
    )

    cond0 = tr > 0
    cond1 = (m00 > m11) & (m00 > m22)
    cond2 = m11 > m22
    q = jnp.where(
        cond0[..., None],
        q0,
        jnp.where(cond1[..., None], q1, jnp.where(cond2[..., None], q2, q3)),
    )
    return normalize(q)


def from_two_vectors(a, b):
    """Rotation taking direction a to direction b (Eigen ``FromTwoVectors``)."""
    an = a / jnp.linalg.norm(a, axis=-1, keepdims=True)
    bn = b / jnp.linalg.norm(b, axis=-1, keepdims=True)
    c = jnp.cross(an, bn)
    d = jnp.sum(an * bn, axis=-1)
    w = 1.0 + d
    q = jnp.concatenate([w[..., None], c], axis=-1)
    # Degenerate anti-parallel case: pick any orthogonal axis.
    ortho = jnp.where(
        jnp.abs(an[..., 0:1]) < 0.9,
        jnp.cross(an, jnp.array([1.0, 0.0, 0.0], dtype=a.dtype)),
        jnp.cross(an, jnp.array([0.0, 1.0, 0.0], dtype=a.dtype)),
    )
    q_flip = jnp.concatenate([jnp.zeros_like(w[..., None]), ortho], axis=-1)
    q = jnp.where((w > 1e-8)[..., None], q, q_flip)
    return normalize(q)


def angular_distance(a, b):
    """Eigen ``a.angularDistance(b)``: 2*atan2(|vec(d)|, |w(d)|), d = a⁻¹ b."""
    d = mul(conjugate(a), b)
    return 2.0 * jnp.arctan2(jnp.linalg.norm(d[..., 1:4], axis=-1), jnp.abs(d[..., 0]))


def build_update_quat(delta_theta):
    """Multiplicative EKF correction quaternion.

    Matches ``buildUpdateQuat`` (reference msckf.h:851-872): dq = 0.5*dθ, the
    vector part is negated, w = sqrt(1-|dq|²) clamped, then normalized.
    """
    dq = 0.5 * delta_theta
    sq = jnp.sum(dq * dq, axis=-1)
    w = jnp.where(sq > 1.0, jnp.ones_like(sq), jnp.sqrt(jnp.maximum(1.0 - sq, 0.0)))
    q = jnp.concatenate([w[..., None], -dq], axis=-1)
    return normalize(q)


def omega_mat_jpl(omega):
    """4x4 Omega matrix acting on the stacked form y=[-x,-y,-z,w].

    Matches ``omegaMat`` (reference matrix_utils.h:19-30):
    ``[[-skew(w), w], [-wᵀ, 0]]``.
    """
    s = skew(omega)
    top = jnp.concatenate([-s, omega[..., :, None]], axis=-1)
    bot = jnp.concatenate([-omega[..., None, :], jnp.zeros_like(omega[..., :1, None])], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def integrate_rk5(q, omega, dt):
    """Fixed-coefficient 6-stage RK integration of quaternion kinematics.

    Numerically mirrors ``propogateImuStateRK`` (reference msckf.h:1425-1458):
    integrate y = [-x,-y,-z,w] under ydot = 0.5*Omega(omega)*y with the same
    RK-Fehlberg-style tableau, then repack and normalize.
    """
    dt = jnp.asarray(dt, dtype=q.dtype)[..., None]
    omega_psi = 0.5 * omega_mat_jpl(omega)

    y0 = jnp.stack([-q[..., 1], -q[..., 2], -q[..., 3], q[..., 0]], axis=-1)

    def f(y):
        return jnp.einsum("...ij,...j->...i", omega_psi, y)

    k0 = f(y0)
    k1 = f(y0 + (k0 / 4.0) * dt)
    k2 = f(y0 + (k0 / 8.0 + k1 / 8.0) * dt)
    k3 = f(y0 + (-k1 / 2.0 + k2) * dt)
    k4 = f(y0 + (k0 * 3.0 / 16.0 + k3 * 9.0 / 16.0) * dt)
    k5 = f(y0 + (-k0 * 3.0 / 7.0 + k1 * 2.0 / 7.0 + k2 * 12.0 / 7.0 - k3 * 12.0 / 7.0 + k4 * 8.0 / 7.0) * dt)

    y_t = y0 + (7.0 * k0 + 32.0 * k2 + 12.0 * k3 + 32.0 * k4 + 7.0 * k5) * dt / 90.0

    q_new = jnp.stack([y_t[..., 3], -y_t[..., 0], -y_t[..., 1], -y_t[..., 2]], axis=-1)
    return normalize(q_new)
