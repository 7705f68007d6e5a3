"""Track bookkeeping: observation append, death detection, staging, insertion.

Fixed-shape re-design of ``MSCKF::update`` and ``MSCKF::addFeatures``
(/root/reference/include/msckf_mono/msckf.h:215-332):

* matching "is this tracked feature still observed" becomes an (M x F) id
  equality matrix instead of std::find loops;
* "remove track & stage for residualization" becomes masked compaction of the
  dead rows into a fixed ``max_staged`` buffer;
* "push_back new track" becomes a masked scatter into free rows.

Deviations from the reference, both deliberate:
* the reference *aborts* addFeatures on the first duplicate id
  (msckf.h:327-330, an error path); we skip duplicates per-feature.
* ``camState::last_correlated_id`` is not maintained — the reference only
  publishes it to ROS (msckf.h:277-285); nothing in the filter consumes it.
"""

from __future__ import annotations

import jax.numpy as jnp

from msckf_mono_tpu.core.types import FilterState, StagedTracks
from msckf_mono_tpu.utils.config import MsckfConfig


def update_tracks(
    state: FilterState, tracked_uv, tracked_ids, tracked_valid, config: MsckfConfig
):
    """Append observations of continuing tracks; stage dead / too-long tracks.

    Must run after ``augment_state`` (observations land in the newest slot),
    mirroring the reference call order (datasets/asl_msckf.cpp:269-274).

    Returns (new_state, staged: StagedTracks).
    """
    shp = config.shapes
    M, N, S = shp.max_tracks, shp.num_slots, shp.max_staged
    tracks = state.tracks
    newest = state.window.count - 1

    # --- match active tracks against this frame's tracked features ---
    match = (
        tracks.active[:, None]
        & tracked_valid[None, :]
        & (tracks.feature_id[:, None] == tracked_ids[None, :])
    )  # (M, F)
    matched = jnp.any(match, axis=1)
    feat_idx = jnp.argmax(match, axis=1)
    new_obs = tracked_uv[feat_idx]  # (M, 2)

    obs = jnp.where(
        matched[:, None, None],
        tracks.obs.at[:, newest, :].set(new_obs),
        tracks.obs,
    )
    obs_mask = tracks.obs_mask.at[:, newest].set(
        tracks.obs_mask[:, newest] | matched
    )

    lengths = jnp.sum(obs_mask, axis=1)
    # Death: lost by the front-end, or track too long (msckf.h:246-248 — the
    # length check runs after the append, so the fresh obs is included).
    dead = tracks.active & (~matched | (lengths >= config.filter.max_track_length))
    eligible = dead & (lengths >= config.filter.min_track_length)

    # --- compact eligible rows into the staged buffer ---
    order = jnp.argsort(jnp.logical_not(eligible), stable=True)[:S]
    staged_valid = eligible[order]
    staged = StagedTracks(
        obs=obs[order],
        obs_mask=obs_mask[order] & staged_valid[:, None],
        feature_id=tracks.feature_id[order],
        valid=staged_valid,
    )
    n_eligible = jnp.sum(eligible)
    overflow = jnp.maximum(n_eligible - S, 0).astype(jnp.int32)

    # --- clear all dead rows (staged or not), mirroring tracks_to_remove ---
    keep = ~dead
    new_tracks = tracks.replace(
        obs=obs * keep[:, None, None],
        obs_mask=obs_mask & keep[:, None],
        feature_id=jnp.where(keep, tracks.feature_id, -1),
        active=tracks.active & keep,
        initialized=tracks.initialized & keep,
        p_f_G=tracks.p_f_G * keep[:, None],
    )

    diag = state.diag.replace(staged_overflow=state.diag.staged_overflow + overflow)
    return state.replace(tracks=new_tracks, diag=diag), staged


def add_features(state: FilterState, new_uv, new_ids, new_valid, config: MsckfConfig):
    """Register brand-new tracks at the newest camera state (msckf.h:302-332)."""
    shp = config.shapes
    M = shp.max_tracks
    tracks = state.tracks
    newest = state.window.count - 1

    dup = jnp.any(
        tracks.active[:, None] & (tracks.feature_id[:, None] == new_ids[None, :]),
        axis=0,
    )
    valid = new_valid & ~dup & (new_ids >= 0)
    F = valid.shape[0]

    # Compact valid new features to the front.
    norder = jnp.argsort(jnp.logical_not(valid), stable=True)
    uv_c = new_uv[norder]
    ids_c = new_ids[norder]
    valid_c = valid[norder]

    # Free track rows, compacted to the front.
    free = ~tracks.active
    forder = jnp.argsort(jnp.logical_not(free), stable=True)
    n_free = jnp.sum(free)

    assign = valid_c & (jnp.arange(F) < n_free)
    rows = jnp.where(assign, forder[jnp.arange(F) % M], M)  # M == out-of-bounds

    obs = tracks.obs.at[rows, newest, :].set(uv_c, mode="drop")
    obs_mask = tracks.obs_mask.at[rows, newest].set(True, mode="drop")
    feature_id = tracks.feature_id.at[rows].set(ids_c, mode="drop")
    active = tracks.active.at[rows].set(True, mode="drop")

    n_valid = jnp.sum(valid)
    overflow = jnp.maximum(n_valid - n_free, 0).astype(jnp.int32)

    new_tracks = tracks.replace(
        obs=obs, obs_mask=obs_mask, feature_id=feature_id, active=active
    )
    diag = state.diag.replace(track_overflow=state.diag.track_overflow + overflow)
    return state.replace(tracks=new_tracks, diag=diag)
