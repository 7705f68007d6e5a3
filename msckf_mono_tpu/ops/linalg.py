"""Small-matrix linear algebra primitives.

XLA's generic LU path is a poor fit for the filter's tiny systems (the 3x3
triangulation solves at /root/reference/include/msckf_mono/msckf.h:1222 run
thousands of times per frame across the batch, and f64 LU is not even
implemented on TPU); closed-form solves keep them on the VPU as pure
elementwise code that fuses into the surrounding computation.
"""

from __future__ import annotations

import jax.numpy as jnp


def solve3x3(A: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Closed-form 3x3 solve via the adjugate; broadcasts over leading axes.

    A: (..., 3, 3), b: (..., 3). Intended for well-damped SPD systems (the LM
    normal equations); the determinant is guarded against exact zero.
    """
    a00, a01, a02 = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    a10, a11, a12 = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    a20, a21, a22 = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]

    c00 = a11 * a22 - a12 * a21
    c01 = a12 * a20 - a10 * a22
    c02 = a10 * a21 - a11 * a20
    det = a00 * c00 + a01 * c01 + a02 * c02
    det = jnp.where(jnp.abs(det) > 1e-30, det, 1e-30)

    c10 = a02 * a21 - a01 * a22
    c11 = a00 * a22 - a02 * a20
    c12 = a01 * a20 - a00 * a21
    c20 = a01 * a12 - a02 * a11
    c21 = a02 * a10 - a00 * a12
    c22 = a00 * a11 - a01 * a10

    b0, b1, b2 = b[..., 0], b[..., 1], b[..., 2]
    x0 = (c00 * b0 + c10 * b1 + c20 * b2) / det
    x1 = (c01 * b0 + c11 * b1 + c21 * b2) / det
    x2 = (c02 * b0 + c12 * b1 + c22 * b2) / det
    return jnp.stack([x0, x1, x2], axis=-1)


def null_project_3(H_f: jnp.ndarray, X: jnp.ndarray) -> jnp.ndarray:
    """Rows 3: of QᵀX, where Q is the complete-QR basis of H_f (n, 3).

    The left-nullspace projection A_nullᵀX (A_null = Q[:, 3:]) without forming
    Q (replaces the SVD of msckf.h:954-957; any orthonormal nullspace basis
    yields the identical EKF update). The three Householder reflectors are
    built on the tiny (n, 3) H_f, then applied to X ONCE in compact-WY form

        QᵀX = X - V Tᵀ (Vᵀ X),   Q = H1 H2 H3 = I - V T Vᵀ,

    i.e. two small GEMMs touching X a single time — the round-3 trace showed
    the sequential three-rank-1-update form re-reading/re-writing the (2N,
    D+1) X three times (~HBM-bound 5% of the frame step).

    Exact-zero rows of H_f produce zero reflector entries, so the matching
    rows of X are untouched — this preserves the row-compaction invariant
    track_projected_rows relies on (valid rows first, zeros after).
    """
    n = H_f.shape[0]
    dtype = X.dtype
    M = H_f.astype(dtype)
    idx = jnp.arange(n)
    vs, ts = [], []
    for j in range(3):
        x = jnp.where(idx >= j, M[:, j], 0.0)
        xj = x[j]
        nrm = jnp.sqrt(jnp.sum(x * x))
        alpha = -jnp.where(xj >= 0, 1.0, -1.0) * nrm
        v = x - alpha * (idx == j)
        vtv = jnp.sum(v * v)
        scale = jnp.where(vtv > 1e-30, 2.0 / vtv, 0.0)
        vs.append(v)
        ts.append(scale)
        M = M - scale * jnp.outer(v, v @ M)

    v1, v2, v3 = vs
    t1, t2, t3 = ts
    a12 = v1 @ v2
    a13 = v1 @ v3
    a23 = v2 @ v3
    # LAPACK larft "forward" T for Q = H1 H2 H3 = I - V T Vᵀ (T upper-tri).
    z = jnp.zeros((), dtype)
    T = jnp.stack([
        jnp.stack([t1, -t1 * t2 * a12, -t3 * (t1 * a13 - t1 * t2 * a12 * a23)]),
        jnp.stack([z, t2, -t2 * t3 * a23]),
        jnp.stack([z, z, t3]),
    ])
    V = jnp.stack([v1, v2, v3], axis=1)                     # (n, 3)
    # Qᵀ = H3 H2 H1 = (I - V T Vᵀ)ᵀ = I - V Tᵀ Vᵀ
    X = X - V @ (T.T @ (V.T @ X))
    return X[3:]


def bmv(A: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """(..., m, k) @ (..., k) -> (..., m) as broadcast-multiply-sum.

    For tiny contractions (k <= 6) XLA lowers ``einsum``/``dot_general`` to a
    convolution fusion that runs HBM-bound at ~100 GFLOP/s on TPU (round-3
    trace: the "convolution fusion" category was 19% of the frame step, all
    of it 3-wide matvecs). The explicit broadcast+reduce form fuses into the
    surrounding elementwise work instead.
    """
    return jnp.sum(A * v[..., None, :], axis=-1)


def bmm_small(A: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    """(..., m, k) @ (..., k, n) -> (..., m, n) as broadcast-multiply-sum.

    Same rationale as :func:`bmv`; only for k <= ~8 (the materialized
    (..., m, k, n) intermediate is tiny there).
    """
    return jnp.sum(A[..., :, :, None] * B[..., None, :, :], axis=-2)
