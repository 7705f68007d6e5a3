"""Pallas batched-PSD-gate kernel vs the dense jnp reference."""

import numpy as np
import jax.numpy as jnp

from msckf_mono_tpu.ops import psd_pallas


def _make_systems(rng, batch_shape, R, dtype=jnp.float32):
    n = int(np.prod(batch_shape))
    X = rng.normal(size=(n, R, R + 4))
    S = np.einsum("nij,nkj->nik", X, X) / R + np.eye(R) * 1e-5
    r = rng.normal(size=(n, R))
    return (
        jnp.asarray(S.reshape(*batch_shape, R, R), dtype),
        jnp.asarray(r.reshape(*batch_shape, R), dtype),
    )


def _gamma_ref(S, r):
    x = np.linalg.solve(np.asarray(S), np.asarray(r)[..., None])[..., 0]
    return np.einsum("...r,...r->...", np.asarray(r), x)


def test_gamma_matches_dense_solve():
    rng = np.random.default_rng(0)
    S, r = _make_systems(rng, (4, 32), 53)
    got = np.asarray(psd_pallas.gamma_psd(S, r, interpret=True))
    want = _gamma_ref(S, r)
    np.testing.assert_allclose(got, want, rtol=2e-3)


def test_gamma_nonmultiple_batch_and_padding():
    rng = np.random.default_rng(1)
    S, r = _make_systems(rng, (7,), 13)
    got = np.asarray(psd_pallas.gamma_psd(S, r, interpret=True))
    want = _gamma_ref(S, r)
    np.testing.assert_allclose(got, want, rtol=2e-3)
    assert got.shape == (7,)


def test_gamma_indefinite_lane_fails_closed():
    """A non-PSD lane yields garbage/NaN gamma in that lane only; the gate
    comparison reads it as False."""
    rng = np.random.default_rng(2)
    S, r = _make_systems(rng, (4,), 8)
    S = S.at[1].set(-jnp.eye(8))
    got = np.asarray(psd_pallas.gamma_psd(S, r, interpret=True))
    ok = np.array([0, 2, 3])
    want = _gamma_ref(S[ok], r[ok])
    np.testing.assert_allclose(got[ok], want, rtol=2e-3)
    assert not (got[1] < 1e30)  # NaN or huge -> gate False
