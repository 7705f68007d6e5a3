#!/usr/bin/env python
"""Measure staged-row distributions at the bench serving shape.

Sizes the round-5 static caps from data instead of guesswork (the same
"measure distributions before sizing static buffers" method that set
max_staged/max_tri_prune in rounds 3-4): per frame-filter across the bench
world, histograms of
  * total valid post-gate update rows  (drives max_update_rows)
  * per-marginalized-track obs count   (drives a marg obs-width cap)
  * per-prune-candidate involved-obs count (drives a prune obs-width cap)
  * prune candidate count              (drives max_staged_prune)
  * prune candidates needing LM        (drives max_tri_prune)

Usage: python tools/measure_row_stats.py [--batch 256] [--frames 200]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--frames", type=int, default=200)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from msckf_mono_tpu.core import augment, filter as mf, prune, tracks, update
    from msckf_mono_tpu.core.init import ground_truth_init
    from msckf_mono_tpu.data import synthetic
    from msckf_mono_tpu.parallel import montecarlo
    from msckf_mono_tpu.utils.config import MsckfConfig

    cfg = MsckfConfig()
    cfg = dataclasses.replace(
        cfg,
        filter=dataclasses.replace(cfg.filter, fused_updates=True,
                                   gating_precision="high"),
        shapes=dataclasses.replace(cfg.shapes, staged_chunk=8, max_staged=8),
    )
    B, T = args.batch, args.frames
    HB = 256  # histogram bins

    seq = synthetic.generate(cfg, n_frames=T, seed=0, pixel_noise=0.5)
    frames = synthetic.to_frame_inputs(seq, jnp.float32)
    imu = ground_truth_init(
        p_I_G=[5.0, 0.0, 0.0], q_IG=[1, 0, 0, 0],
        v_I_G=[0.0, 5.0 * 0.35, 0.2 * 1.4], b_g=seq.b_g, b_a=seq.b_a,
        dtype=jnp.float32,
    )
    states = montecarlo.make_fleet(cfg, imu, B, key=jax.random.PRNGKey(0),
                                   dtype=jnp.float32)
    bframes = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x[:, None], (T, B) + x.shape[1:]), frames
    )

    def hist(vals, mask):
        """Masked histogram over HB bins; vals int."""
        idx = jnp.clip(vals, 0, HB - 1)
        oh = (idx[..., None] == jnp.arange(HB)) & mask[..., None]
        return jnp.sum(oh.reshape(-1, HB).astype(jnp.int32), axis=0)

    def one_filter_stats(state, frame):
        """Mirror filter.step's fused path, returning stats + new state."""
        state0 = state
        state = prune.clear_frame_archive(state)
        with jax.default_matmul_precision(cfg.filter.matmul_precision):
            state = mf.propagate_block(state, frame, cfg)
            state = augment.augment_state(state, frame.state_id, frame.time, cfg)
            state, staged = tracks.update_tracks(
                state, frame.tracked_uv, frame.tracked_ids, frame.tracked_valid, cfg
            )
            state = tracks.add_features(
                state, frame.new_uv, frame.new_ids, frame.new_valid, cfg
            )
            # --- fused update with stats (mirrors mf._fused_vision_update)
            sigma2 = state.meas_sigma2.astype(state.P.dtype)
            window, g = state.window, state.imu.g
            S_m = cfg.shapes.max_staged
            p_f, track_ok, motion_ok, tri_ok = update.marginalize_prep(state, staged, cfg)
            prep = prune.prune_prep(state, cfg)
            obs = jnp.concatenate([staged.obs, prep["c_obs"]])
            masks = jnp.concatenate([staged.obs_mask, prep["c_mask_inv"]])
            p_all = jnp.concatenate([p_f, prep["p_use"]])
            ok_all = jnp.concatenate([track_ok, prep["use_track"]])
            out = update.gated_row_stack(
                obs, masks, p_all, ok_all, window, g, state.P, sigma2, cfg
            )
            H, r, gate_ok, rows_present, n_dropped = out[:5]

            m_all = jnp.sum(masks, axis=1).astype(jnp.int32)       # obs per staged
            contributes = ok_all & gate_ok
            rows_per = jnp.maximum(2 * m_all - 3, 0) * contributes
            st = dict(
                rows_total=jnp.sum(rows_per).astype(jnp.int32),
                m_marg=m_all[:S_m],
                m_marg_mask=contributes[:S_m],
                m_prune=m_all[S_m:],
                m_prune_mask=contributes[S_m:],
                n_cand=jnp.sum(prep["use_track"]).astype(jnp.int32),
                n_tri=jnp.sum(prep["rm"][None, :] &
                              state.tracks.obs_mask, axis=1).astype(jnp.int32)[0] * 0
                      + jnp.sum(state.tracks.active &
                                ~state.tracks.initialized &
                                (jnp.sum(state.tracks.obs_mask &
                                         prep["rm"][None, :], axis=1) >= 2)
                                ).astype(jnp.int32),
                n_rm=jnp.sum(prep["rm"]).astype(jnp.int32),
            )
            state = update.measurement_update(state, H, r, sigma2, cfg)
            state = update.marginalize_post(
                state, staged, p_f, track_ok, motion_ok, tri_ok,
                gate_ok[:S_m], rows_present[:S_m], n_dropped, cfg,
            )
            state = prune.prune_post(state, prep, gate_ok[S_m:], n_dropped * 0, cfg)
            state = prune.prune_empty_states(state, cfg)
        state = jax.tree_util.tree_map(
            lambda new, old: jnp.where(
                jnp.reshape(frame.frame_valid, (1,) * new.ndim), new, old
            ), state, state0,
        )
        return state, st

    def body(carry, frame):
        states, h = carry
        states, st = jax.vmap(lambda s, f: one_filter_stats(s, f))(states, frame)
        ones = jnp.ones_like(st["rows_total"], bool)
        h = dict(
            rows=h["rows"] + hist(st["rows_total"], ones),
            m_marg=h["m_marg"] + hist(st["m_marg"], st["m_marg_mask"]),
            m_prune=h["m_prune"] + hist(st["m_prune"], st["m_prune_mask"]),
            n_cand=h["n_cand"] + hist(st["n_cand"], ones),
            n_tri=h["n_tri"] + hist(st["n_tri"], ones),
            n_rm=h["n_rm"] + hist(st["n_rm"], ones),
        )
        return (states, h), None

    h0 = {k: jnp.zeros((HB,), jnp.int32)
          for k in ("rows", "m_marg", "m_prune", "n_cand", "n_tri", "n_rm")}

    @jax.jit
    def run(states, frames):
        (states, h), _ = jax.lax.scan(body, (states, h0), frames)
        return h

    log(f"device={jax.devices()[0]} batch={B} frames={T}; compiling...")
    h = run(states, bframes)
    h = {k: np.asarray(jax.device_get(v)) for k, v in h.items()}

    def summarize(name, counts):
        tot = counts.sum()
        if tot == 0:
            return {"total": 0}
        vals = np.arange(len(counts))
        cdf = np.cumsum(counts) / tot
        mean = float((vals * counts).sum() / tot)
        out = {
            "total": int(tot), "mean": round(mean, 2),
            "p50": int(vals[np.searchsorted(cdf, 0.5)]),
            "p95": int(vals[np.searchsorted(cdf, 0.95)]),
            "p99": int(vals[np.searchsorted(cdf, 0.99)]),
            "p999": int(vals[np.searchsorted(cdf, 0.999)]),
            "max": int(vals[counts > 0].max()),
        }
        log(f"{name:10s} {out}")
        return out

    res = {k: summarize(k, v) for k, v in h.items()}
    print(json.dumps(res))


if __name__ == "__main__":
    main()
