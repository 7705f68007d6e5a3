"""Window pruning.

Fixed-shape re-design of ``pruneEmptyStates`` / ``pruneRedundantStates`` /
``findRedundantCamStates`` (/root/reference/include/msckf_mono/msckf.h:453-761,
1049-1098). Slot removal is masked compaction (core/window.py); the redundant
path's "use the doomed observations in one last update" becomes the same
projected-row machinery as marginalization, restricted to the involved
observation columns.

Behavioral notes (all from the reference):
* empty pruning only ever removes a LEADING run of feature-less states, and
  only while the window exceeds ``max_cam_states`` (msckf.h:699-717);
* redundant pruning is gated on a hardcoded window size of 20 (msckf.h:455),
  not on ``max_cam_states``;
* keyframe selection walks the window marking states too close in both
  distance and angle to the last kept keyframe, never touching the last 3
  states, stopping early once the window would fit, then tops up with the
  oldest unmarked states; fewer than 2 marks means no pruning (msckf.h:1049-1098);
* tracks keep a cached triangulation (``initialized``/``p_f_G``) that later
  prunes reuse without re-checking (msckf.h:488-531).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from msckf_mono_tpu.core.types import FilterState
from msckf_mono_tpu.core.window import compact_slots
from msckf_mono_tpu.core import triangulate
from msckf_mono_tpu.core.update import gated_row_stack, measurement_update
from msckf_mono_tpu.utils import quat
from msckf_mono_tpu.utils.config import MsckfConfig


def slot_has_active_features(state: FilterState):
    """Per-slot: does any live track observe it? (== tracked_feature_ids nonempty)."""
    return jnp.any(state.tracks.active[:, None] & state.tracks.obs_mask, axis=0)


def _archive_removed(state: FilterState, rm) -> FilterState:
    """Append the rm-marked slots' poses (at removal) to the per-frame pruned
    archive — the feed for the reference's ``pruned_states_``
    (msckf.h:49; pushes at :525/:715 in both prune paths). Both prune stages
    of one frame append into the same N-wide buffer (their slot sets are
    disjoint, so total removals per frame are bounded by the window size).

    The append is a one-hot matmul (batched scatters with per-filter indices
    lower to per-element loops on TPU; one-hot selection is exact at the
    step's HIGHEST matmul precision).
    """
    w = state.window
    dtype = state.P.dtype
    N = rm.shape[0]
    n_old = jnp.sum(state.pruned_mask.astype(jnp.int32))
    tgt = n_old + jnp.cumsum(rm.astype(jnp.int32)) - 1
    sel = ((tgt[None, :] == jnp.arange(N)[:, None]) & rm[None, :]).astype(dtype)
    newrow = jnp.sum(sel, axis=1) > 0
    ids_f = sel @ w.state_id.astype(dtype)
    return state.replace(
        pruned_q=jnp.where(newrow[:, None], sel @ w.q_CG, state.pruned_q),
        pruned_p=jnp.where(newrow[:, None], sel @ w.p_C_G, state.pruned_p),
        pruned_time=jnp.where(newrow, sel @ w.time, state.pruned_time),
        pruned_ids=jnp.where(newrow, ids_f.astype(jnp.int32), state.pruned_ids),
        pruned_mask=state.pruned_mask | newrow,
    )


def clear_frame_archive(state: FilterState) -> FilterState:
    """Reset the per-frame pruned/tri-map buffers (called at frame start)."""
    return state.replace(
        pruned_q=jnp.zeros_like(state.pruned_q),
        pruned_p=jnp.zeros_like(state.pruned_p),
        pruned_time=jnp.zeros_like(state.pruned_time),
        pruned_ids=jnp.full_like(state.pruned_ids, -1),
        pruned_mask=jnp.zeros_like(state.pruned_mask),
        tri_map_pts=jnp.zeros_like(state.tri_map_pts),
        tri_map_mask=jnp.zeros_like(state.tri_map_mask),
    )


def prune_empty_states(state: FilterState, config: MsckfConfig) -> FilterState:
    N = config.shapes.num_slots
    max_states = config.filter.max_cam_states
    count = state.window.count
    has = slot_has_active_features(state)

    over = count - max_states  # only slots 0..over-1 are candidates
    idx = jnp.arange(N)
    nonempty_tail = has & (idx >= 1)
    first_nonempty = jnp.where(
        jnp.any(nonempty_tail), jnp.argmax(nonempty_tail), over
    )
    n_remove = jnp.minimum(first_nonempty, over)
    n_remove = jnp.where((count > max_states) & ~has[0], n_remove, 0)

    keep = state.window.valid & (idx >= n_remove)
    state = _archive_removed(state, state.window.valid & ~keep)
    return compact_slots(state, keep)


def find_redundant_slots(state: FilterState, config: MsckfConfig):
    """Keyframe-style selection of slots to remove (msckf.h:1049-1098)."""
    N = config.shapes.num_slots
    window = state.window
    count = window.count
    max_states = config.filter.max_cam_states
    dist_thresh = config.redundancy_distance
    angle_thresh = config.redundancy_angle

    idx = jnp.arange(N)
    protected = idx >= count - 3  # the last 3 states are never candidates

    def body(j, carry):
        rm, marked, kf, stopped = carry
        active = window.valid[j] & ~protected[j] & ~stopped & (j >= 1)
        dist = jnp.linalg.norm(window.p_C_G[j] - window.p_C_G[kf])
        angle = quat.angular_distance(window.q_CG[j], window.q_CG[kf])
        close = (dist < dist_thresh) & (angle < angle_thresh)
        mark = active & close
        rm = rm.at[j].set(rm[j] | mark)
        marked = marked + mark.astype(jnp.int32)
        kf = jnp.where(active & ~close, j, kf)
        stopped = stopped | (active & ((count - marked) <= max_states))
        return rm, marked, kf, stopped

    # Carry inits derive from window data (not fresh constants) so their
    # "varying" axis status matches the loop outputs under shard_map.
    rm0 = window.valid & False
    zero = count * 0
    rm, marked, _, _ = jax.lax.fori_loop(
        1, N, body, (rm0, zero, zero, count < 0)
    )

    # Top-up: mark the first num_over_max slots that are still unmarked.
    num_over_max = count - marked - max_states
    topup = (idx < num_over_max) & ~rm & window.valid
    rm = rm | topup

    enough = (jnp.sum(rm) >= 2) & (count >= 5)
    rm = rm & enough
    return rm


def prune_prep(state: FilterState, config: MsckfConfig):
    """Redundant-slot selection + candidate compaction + triangulation (the
    front half of msckf.h:453-682). Returns a dict of staged prune inputs."""
    fcfg = config.filter
    shp = config.shapes
    window = state.window
    tracks = state.tracks

    run = window.count >= 20  # hardcoded in the reference (msckf.h:455)
    rm = find_redundant_slots(state, config) & run

    involved = tracks.obs_mask & rm[None, :]           # (M, N)
    n_involved = jnp.sum(involved, axis=1)

    # Tracks needing residualization of their involved obs (>=2 of them).
    cand = tracks.active & (n_involved >= 2)

    # LM-triangulate ONLY the candidates without a cached triangulation
    # (the reference caches too, msckf.h:488-531): measured un-initialized
    # candidates are mean 1.4 / p90 4 per frame while ALL ~19 candidates were
    # paying the full 11x11-trial LM sweep — the hottest block of the round-3
    # frame-step trace. Selection happens at TABLE level so the cache
    # write-back in prune_post is a plain mask, not a scatter.
    T = min(shp.max_tri_prune, shp.max_tracks)
    tri_cand = cand & ~tracks.initialized
    torder = jnp.argsort(jnp.logical_not(tri_cand), stable=True)[:T]
    t_valid = tri_cand[torder]
    t_obs = tracks.obs[torder]
    t_mask = tracks.obs_mask[torder] & t_valid[:, None]
    motion_ok_t = jax.vmap(
        lambda o, om: triangulate.check_motion(
            o, om, window.q_CG, window.p_C_G, fcfg.translation_threshold
        )
    )(t_obs, t_mask)
    p_new_t, tri_ok_t = jax.vmap(
        lambda o, om: triangulate.initialize_position(
            o, om, window.q_CG, window.p_C_G, config.max_gn_cost_norm,
            n_iters=fcfg.lm_iters, n_trials=fcfg.lm_trials,
        )
    )(t_obs, t_mask)
    ok_t = t_valid & motion_ok_t & tri_ok_t & jnp.all(jnp.isfinite(p_new_t), axis=-1)
    p_new_t = jnp.nan_to_num(p_new_t, nan=0.0, posinf=0.0, neginf=0.0)
    newly_init_tab = jnp.zeros_like(tracks.initialized).at[torder].set(ok_t)
    p_new_tab = jnp.zeros_like(tracks.p_f_G).at[torder].set(
        jnp.where(ok_t[:, None], p_new_t, 0.0)
    )
    # Which tracks got an LM attempt (regardless of success) — used below to
    # count tri-budget drops without double-counting candidates the S buffer
    # already dropped.
    tri_attempted_tab = jnp.zeros_like(tracks.initialized).at[torder].set(t_valid)

    # Compact candidate tracks into a fixed buffer. Sized separately from
    # marginalize's buffer: most live tracks observe the removed slots, so
    # the prune path needs more headroom (diag.staged_overflow watches).
    S = shp.max_staged_prune
    order = jnp.argsort(jnp.logical_not(cand), stable=True)[:S]
    c_valid = cand[order]
    c_obs = tracks.obs[order]
    c_mask_inv = involved[order] & c_valid[:, None]
    c_init = tracks.initialized[order] & c_valid
    c_new = newly_init_tab[order] & c_valid
    n_dropped_tracks = jnp.maximum(jnp.sum(cand) - S, 0).astype(jnp.int32)
    # Tri-budget drops counted only among IN-BUFFER candidates (a candidate
    # beyond both budgets loses one update, not two).
    n_tri_dropped = jnp.sum(
        c_valid & ~c_init & ~tri_attempted_tab[order]
    ).astype(jnp.int32)

    use_track = c_valid & (c_init | c_new)
    p_use = jnp.where(c_new[:, None], p_new_tab[order], tracks.p_f_G[order])

    return dict(
        rm=rm, c_obs=c_obs, c_mask_inv=c_mask_inv, p_use=p_use,
        use_track=use_track, newly_init_tab=newly_init_tab,
        p_new_tab=p_new_tab,
        tri_pts=p_new_t, tri_ok=ok_t,
        n_dropped_tracks=n_dropped_tracks + n_tri_dropped,
    )


def prune_post(state: FilterState, prep, gate_ok, n_rows_dropped,
               config: MsckfConfig) -> FilterState:
    """Cache scatter-back, involved-obs erasure, slot removal, diagnostics
    (the back half of msckf.h:453-682)."""
    rm = prep["rm"]
    newly_init_tab, p_new_tab = prep["newly_init_tab"], prep["p_new_tab"]

    # Persist newly-cached triangulations (already in table order).
    tracks = state.tracks
    tracks = tracks.replace(
        initialized=tracks.initialized | newly_init_tab,
        p_f_G=jnp.where(newly_init_tab[:, None], p_new_tab, tracks.p_f_G),
    )

    # Erase involved observations from every track (msckf.h:482-485, 498-524,
    # 597-606 — all paths end with the involved obs removed).
    tracks = tracks.replace(
        obs_mask=tracks.obs_mask & ~rm[None, :],
        obs=tracks.obs * (~rm[None, :, None]),
    )
    state = state.replace(
        tracks=tracks,
        # prune-stage map contributions (the reference pushes points
        # triangulated here to map_ as well, msckf.h:531)
        tri_map_pts=prep["tri_pts"].astype(state.P.dtype),
        tri_map_mask=prep["tri_ok"],
    )

    # Archive then remove the slots (poses are post-one-last-update here,
    # matching the reference's push of *cam_state_it at msckf.h:631).
    state = _archive_removed(state, state.window.valid & rm)
    keep = state.window.valid & ~rm
    state = compact_slots(state, keep)

    diag = state.diag.replace(
        row_overflow=state.diag.row_overflow + n_rows_dropped,
        staged_overflow=state.diag.staged_overflow + prep["n_dropped_tracks"],
        gating_rejects=state.diag.gating_rejects
        + jnp.sum(prep["use_track"] & ~gate_ok).astype(jnp.int32),
    )
    return state.replace(diag=diag)


def prune_redundant_states(state: FilterState, config: MsckfConfig) -> FilterState:
    dtype = state.P.dtype
    sigma2 = state.meas_sigma2.astype(dtype)  # per-filter noise (grid fleets)
    window = state.window
    g = state.imu.g

    prep = prune_prep(state, config)

    # Projected rows over the involved observations only (chunked over the
    # candidate axis — see update.gated_row_stack for the memory rationale).
    out = gated_row_stack(
        prep["c_obs"], prep["c_mask_inv"], prep["p_use"], prep["use_track"],
        window, g, state.P, sigma2, config,
        m_cap=config.shapes.prune_obs_cap or None,
        chunk=config.shapes.prune_chunk or None,
    )
    H, r, gate_ok, _rows_present, n_rows_dropped = out[:5]
    V, tids = (out[5], out[6]) if config.filter.use_anisotropic_r else (None, None)
    state = measurement_update(state, H, r, sigma2, config, V=V, v_track_ids=tids)

    return prune_post(state, prep, gate_ok, n_rows_dropped, config)
