"""Window slot compaction.

The reference erases camera states from ``std::vector`` and slices covariance
blocks with ``square_slice``/``column_slice`` (/root/reference/include/
msckf_mono/msckf.h:626-681, matrix_utils.h:57-87). The fixed-shape equivalent
is a single permutation applied consistently to (a) the window arrays, (b) the
track observation columns, and (c) the 6x6 covariance blocks, followed by
masking the now-invalid tail. Static shapes throughout; the permutation is a
gather, which XLA lowers to efficient dynamic-slice code on TPU.
"""

from __future__ import annotations

import jax.numpy as jnp

from msckf_mono_tpu.core.types import FilterState


def compact_slots(state: FilterState, keep: jnp.ndarray) -> FilterState:
    """Remove window slots where ``keep`` is False, compacting survivors to the
    front in original (chronological) order.

    ``keep`` must be False for all already-invalid slots.
    """
    N = keep.shape[0]
    window = state.window
    tracks = state.tracks

    # Stable order: kept slots first, preserving relative order.
    order = jnp.argsort(jnp.logical_not(keep), stable=True)
    n_keep = jnp.sum(keep.astype(jnp.int32))
    new_valid = jnp.arange(N) < n_keep

    new_window = window.replace(
        q_CG=window.q_CG[order],
        p_C_G=window.p_C_G[order],
        time=window.time[order],
        state_id=jnp.where(new_valid, window.state_id[order], -1),
        valid=new_valid,
    )

    new_obs_mask = tracks.obs_mask[:, order] & new_valid[None, :]
    new_tracks = tracks.replace(obs=tracks.obs[:, order, :], obs_mask=new_obs_mask)

    # Covariance: permute 6-blocks, then zero invalid rows/cols.
    D = state.P.shape[0]
    dims = jnp.concatenate(
        [jnp.arange(15), (15 + 6 * order[:, None] + jnp.arange(6)[None, :]).reshape(-1)]
    )
    P = state.P[dims][:, dims]
    dim_valid = jnp.concatenate(
        [jnp.ones(15, bool), jnp.repeat(new_valid, 6, total_repeat_length=6 * N)]
    )
    P = P * (dim_valid[:, None] & dim_valid[None, :])
    assert P.shape == (D, D)

    return state.replace(window=new_window, tracks=new_tracks, P=P)
