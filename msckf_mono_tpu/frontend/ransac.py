"""Two-point translation RANSAC with gyro-known rotation.

Re-design of ``TrackHandler::twoPointRansac`` (/root/reference/src/
corner_detector.cpp:445-546): 300 hypotheses, 2-point translation kernel,
Sampson-error inliers. All hypotheses evaluate in parallel as one batch
instead of a sequential loop; the kernel of the 2x3 constraint matrix is the
cross product of its rows (what FullPivLU::kernel computes up to scale).

Note the reference *disables* this filter with ``&& false``
(corner_detector.cpp:366); the track handler exposes the same default-off
switch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from msckf_mono_tpu.utils import quat


def two_point_ransac(
    dR,
    old_pts,
    new_pts,
    valid,
    key,
    threshold: float = 2e-7,
    num_iters: int = 300,
):
    """old_pts/new_pts: (F,2) normalized coords; dR rotates old frame -> new.

    Returns an inlier mask (F,) (all-True when fewer than 5 valid points,
    mirroring corner_detector.cpp:480-483).
    """
    F = old_pts.shape[0]
    ones = jnp.ones((F, 1), old_pts.dtype)
    x1 = jnp.concatenate([old_pts, ones], axis=-1)  # (F,3)
    x2 = jnp.concatenate([new_pts, ones], axis=-1)

    n_valid = jnp.sum(valid)

    # sample hypothesis pairs among valid points (rejection-free: sample ranks)
    k1, k2 = jax.random.split(key)
    idx_pool = jnp.argsort(jnp.logical_not(valid), stable=True)  # valid first
    n = jnp.maximum(n_valid, 2)
    i1 = idx_pool[jax.random.randint(k1, (num_iters,), 0, n)]
    off = jax.random.randint(k2, (num_iters,), 1, jnp.maximum(n - 1, 1))
    i2 = idx_pool[(jax.random.randint(k1, (num_iters,), 0, n) + off) % n]

    Rx1 = x1 @ dR.T  # (F,3)

    def hypothesis(a, b):
        # rows: (dR x1_i)ᵀ [x2_i]_x  -> 2x3; kernel = cross(row0, row1)
        r0 = Rx1[a] @ quat.skew(x2[a])
        r1 = Rx1[b] @ quat.skew(x2[b])
        t = jnp.cross(r0, r1)
        tn = jnp.linalg.norm(t)
        t = jnp.where(tn > 1e-12, t / jnp.maximum(tn, 1e-12), jnp.zeros(3, t.dtype))
        E = quat.skew(t) @ dR
        Ex1 = x1 @ E.T        # (F,3)
        Ex2 = x2 @ E          # (F,3)
        num = jnp.sum(x2 * Ex1, axis=-1) ** 2
        den = Ex1[:, 0] ** 2 + Ex1[:, 1] ** 2 + Ex2[:, 0] ** 2 + Ex2[:, 1] ** 2
        err = num / jnp.maximum(den, 1e-30)
        inl = (err < threshold) & valid & (tn > 1e-12)
        return inl, jnp.sum(inl)

    inliers, counts = jax.vmap(hypothesis)(i1, i2)
    best = jnp.argmax(counts)
    best_inliers = inliers[best]
    return jnp.where(n_valid < 5, valid, best_inliers)
