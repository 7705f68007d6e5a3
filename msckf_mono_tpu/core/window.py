"""Window slot compaction.

The reference erases camera states from ``std::vector`` and slices covariance
blocks with ``square_slice``/``column_slice`` (/root/reference/include/
msckf_mono/msckf.h:626-681, matrix_utils.h:57-87). The fixed-shape equivalent
is a single permutation applied consistently to (a) the window arrays, (b) the
track observation columns, and (c) the 6x6 covariance blocks, followed by
masking the now-invalid tail.

TPU note: the permutation of P is applied as ``E P Eᵀ`` with ``E`` the one-hot
permutation matrix — two MXU matmuls — NOT as a two-sided gather. A batched
``P[dims][:, dims]`` lowers to per-element dynamic gathers on TPU and was the
single hottest op of the round-2 frame step (measured via tools/microbench.py:
the gather-based prune_empty cost ~600 ms/step at batch 256, the matmul form
is ~100x cheaper). One-hot matmuls are exact in any matmul precision (the
6-pass bf16 decomposition reconstructs f32 products of 1.0 exactly).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from msckf_mono_tpu.core.types import FilterState

# Permutation matmuls must be exact regardless of the ambient matmul-precision
# context (one-hot times f32 reconstructs exactly only with full-precision
# accumulation).
_EXACT = jax.lax.Precision.HIGHEST


def slot_permutation(keep: jnp.ndarray):
    """Stable front-compaction order for kept slots.

    Returns (order (N,) int32, new_valid (N,) bool): new slot i holds old slot
    ``order[i]``; slots >= sum(keep) become invalid.
    """
    N = keep.shape[0]
    order = jnp.argsort(jnp.logical_not(keep), stable=True)
    new_valid = jnp.arange(N) < jnp.sum(keep.astype(jnp.int32))
    return order, new_valid


def permute_window_tracks(state: FilterState, order, new_valid) -> FilterState:
    """Apply a slot permutation to the window arrays and track observation
    columns (small tensors — plain gathers are fine here)."""
    window = state.window
    tracks = state.tracks

    new_window = window.replace(
        q_CG=window.q_CG[order],
        p_C_G=window.p_C_G[order],
        time=window.time[order],
        state_id=jnp.where(new_valid, window.state_id[order], -1),
        valid=new_valid,
    )
    new_obs_mask = tracks.obs_mask[:, order] & new_valid[None, :]
    new_tracks = tracks.replace(
        obs=tracks.obs[:, order, :] * new_obs_mask[:, :, None],
        obs_mask=new_obs_mask,
    )
    return state.replace(window=new_window, tracks=new_tracks)


def permute_covariance(P: jnp.ndarray, order, new_valid) -> jnp.ndarray:
    """P' = E P Eᵀ for the slot permutation, then zero invalid rows/cols."""
    N = order.shape[0]
    D = P.shape[0]
    dtype = P.dtype

    # E_cam = kron(onehot, I6): (6N, 6N) without materializing a kron op.
    onehot = (order[:, None] == jnp.arange(N)[None, :]).astype(dtype)  # (N, N)
    E_cam = (onehot[:, None, :, None] * jnp.eye(6, dtype=dtype)[None, :, None, :]).reshape(
        6 * N, 6 * N
    )

    P00 = P[:15, :15]
    P0c = jnp.matmul(P[:15, 15:], E_cam.T, precision=_EXACT)          # (15, 6N)
    Pcc = jnp.matmul(
        jnp.matmul(E_cam, P[15:, 15:], precision=_EXACT), E_cam.T, precision=_EXACT
    )  # (6N, 6N)

    P = jnp.zeros_like(P)
    P = P.at[:15, :15].set(P00)
    P = P.at[:15, 15:].set(P0c)
    P = P.at[15:, :15].set(P0c.T)
    P = P.at[15:, 15:].set(Pcc)

    dim_valid = jnp.concatenate(
        [jnp.ones(15, bool), jnp.repeat(new_valid, 6, total_repeat_length=6 * N)]
    )
    P = P * (dim_valid[:, None] & dim_valid[None, :])
    assert P.shape == (D, D)
    return P


def compact_slots(state: FilterState, keep: jnp.ndarray) -> FilterState:
    """Remove window slots where ``keep`` is False, compacting survivors to the
    front in original (chronological) order.

    ``keep`` must be False for all already-invalid slots.
    """
    order, new_valid = slot_permutation(keep)
    state = permute_window_tracks(state, order, new_valid)
    return state.replace(P=permute_covariance(state.P, order, new_valid))
