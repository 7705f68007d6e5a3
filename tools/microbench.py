#!/usr/bin/env python
"""Microbenchmarks of the frame-step's candidate hot ops on the live device.

The tunneled TPU adds ~0.7 s of per-dispatch latency, which swamps single-call
timings (the round-2 per-stage table measured mostly dispatch floor). Each op
here is therefore iterated ``iters`` times INSIDE one jitted ``lax.scan``, so
the reported per-iteration time is pure device time.

Usage: python tools/microbench.py [--batch 256] [--iters 20] [--only pat]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--only", default=None)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from msckf_mono_tpu.core import augment, prune, tracks as tracks_mod, update
    from msckf_mono_tpu.core import triangulate
    from msckf_mono_tpu.core import filter as mf
    from msckf_mono_tpu.core.window import compact_slots
    from msckf_mono_tpu.core.init import ground_truth_init
    from msckf_mono_tpu.data import synthetic
    from msckf_mono_tpu.parallel import montecarlo
    from msckf_mono_tpu.utils.config import MsckfConfig

    B = args.batch
    cfg = MsckfConfig()
    N = cfg.shapes.num_slots
    D = cfg.shapes.state_dim

    # Build a mid-sequence batched state by running a few frames on CPU-free
    # synthetic inputs (cheap shapes, real sparsity patterns).
    seq = synthetic.generate(cfg, n_frames=30, seed=0, pixel_noise=0.5)
    frames = synthetic.to_frame_inputs(seq, jnp.float32)
    imu = ground_truth_init(
        p_I_G=[5.0, 0.0, 0.0], q_IG=[1, 0, 0, 0],
        v_I_G=[0.0, 5.0 * 0.35, 0.2 * 1.4],
        b_g=seq.b_g, b_a=seq.b_a, dtype=jnp.float32,
    )
    states = montecarlo.make_fleet(cfg, imu, B, dtype=jnp.float32)
    bframes = montecarlo.broadcast_frames(frames, B)

    warm = jax.jit(
        lambda s, f: jax.vmap(lambda ss, ff: mf.run_sequence(ss, ff, cfg), in_axes=(0, 1))(s, f)[0]
    )
    t0 = time.perf_counter()
    state = warm(states, bframes)
    jax.block_until_ready(state)
    log(f"warmup 30 frames: {time.perf_counter() - t0:.1f}s")
    frame1 = jax.tree_util.tree_map(lambda x: x[-1], bframes)

    # staged buffer for marginalize
    def get_staged(s, f):
        s = mf.propagate_block(s, f, cfg)
        s = augment.augment_state(s, f.state_id, f.time, cfg)
        return tracks_mod.update_tracks(s, f.tracked_uv, f.tracked_ids, f.tracked_valid, cfg)

    mstate, staged = jax.jit(jax.vmap(get_staged))(state, frame1)
    jax.block_until_ready((mstate, staged))

    sigma2 = jnp.float32(cfg.u_var_prime)

    # ---------------- benchmark registry ----------------
    # Each entry: (name, fn(state_like) -> state_like-compatible output to carry)
    # fn must map a FilterState batch to a FilterState batch (or use closure data).

    def vm(f):
        return jax.vmap(f)

    keep_mask = state.window.valid & (jnp.arange(N)[None, :] >= 2)

    entries = {
        "full_step": lambda s: vm(lambda ss, ff: mf.step(ss, ff, cfg)[0])(s, frame1),
        "propagate_block": lambda s: vm(lambda ss, ff: mf.propagate_block(ss, ff, cfg))(s, frame1),
        "augment": lambda s: vm(lambda ss, ff: augment.augment_state(ss, ff.state_id, ff.time, cfg))(s, frame1),
        "update_tracks": lambda s: vm(
            lambda ss, ff: tracks_mod.update_tracks(ss, ff.tracked_uv, ff.tracked_ids, ff.tracked_valid, cfg)[0]
        )(s, frame1),
        "add_features": lambda s: vm(
            lambda ss, ff: tracks_mod.add_features(ss, ff.new_uv, ff.new_ids, ff.new_valid, cfg)
        )(s, frame1),
        "marginalize": lambda s: vm(lambda ss, st: update.marginalize(ss, st, cfg))(s, staged),
        "prune_redundant": lambda s: vm(lambda ss: prune.prune_redundant_states(ss, cfg))(s),
        "prune_empty": lambda s: vm(lambda ss: prune.prune_empty_states(ss, cfg))(s),
        "compact_slots": lambda s: vm(lambda ss, k: compact_slots(ss, k))(s, keep_mask),
        "triangulate_staged": lambda s: s.replace(
            map_pts=vm(
                lambda ss, st: jax.vmap(
                    lambda o, om: triangulate.initialize_position(
                        o, om, ss.window.q_CG, ss.window.p_C_G, cfg.max_gn_cost_norm
                    )[0]
                )(st.obs, st.obs_mask)
            )(s, staged).astype(s.map_pts.dtype)
        ),
        "gated_row_stack": lambda s: s.replace(
            P=s.P
            + 0.0
            * vm(
                lambda ss, st: update.gated_row_stack(
                    st.obs, st.obs_mask, jnp.zeros((cfg.shapes.max_staged, 3), s.P.dtype),
                    st.valid, ss.window, ss.imu.g, ss.P, sigma2, cfg
                )[0]
            )(s, staged).sum(axis=(1, 2))[:, None, None]
        ),
        "measurement_update": lambda s: vm(
            lambda ss: update.measurement_update(
                ss,
                jnp.ones((cfg.shapes.max_update_rows, D), s.P.dtype) * 1e-3,
                jnp.ones((cfg.shapes.max_update_rows,), s.P.dtype) * 1e-4,
                sigma2,
                cfg,
            )
        )(s),
    }

    # ---- prune_redundant sub-parts (the round-2 hotspot: 507 ms of the
    # 817 ms step at batch 256; the analogous marginalize parts only explain
    # ~100 ms, so find the rest) ----
    def _prune_parts(ss, upto):
        import dataclasses as _dc

        fcfg = cfg.filter
        shp = cfg.shapes
        sigma2_ = jnp.asarray(cfg.u_var_prime, ss.P.dtype)
        window = ss.window
        tracks = ss.tracks
        g = ss.imu.g

        run = window.count >= 20
        rm = prune.find_redundant_slots(ss, cfg) & run
        if upto == "find":
            return ss.replace(P=ss.P + 0.0 * jnp.sum(rm).astype(ss.P.dtype))

        involved = tracks.obs_mask & rm[None, :]
        n_involved = jnp.sum(involved, axis=1)
        cand = tracks.active & (n_involved >= 2)
        S = shp.max_staged_prune
        order = jnp.argsort(jnp.logical_not(cand), stable=True)[:S]
        c_valid = cand[order]
        c_obs = tracks.obs[order]
        c_mask_full = tracks.obs_mask[order] & c_valid[:, None]
        c_mask_inv = involved[order] & c_valid[:, None]
        c_init = tracks.initialized[order] & c_valid
        c_pf = tracks.p_f_G[order]
        if upto == "compactcand":
            return ss.replace(P=ss.P + 0.0 * jnp.sum(c_obs) * jnp.sum(c_mask_inv))

        motion_ok = jax.vmap(
            lambda o, om: triangulate.check_motion(
                o, om, window.q_CG, window.p_C_G, fcfg.translation_threshold
            )
        )(c_obs, c_mask_full)
        p_new, tri_ok = jax.vmap(
            lambda o, om: triangulate.initialize_position(
                o, om, window.q_CG, window.p_C_G, cfg.max_gn_cost_norm
            )
        )(c_obs, c_mask_full)
        tri_ok = tri_ok & jnp.all(jnp.isfinite(p_new), axis=-1)
        p_new = jnp.nan_to_num(p_new, nan=0.0, posinf=0.0, neginf=0.0)
        newly_init = c_valid & ~c_init & motion_ok & tri_ok
        use_track = c_valid & (c_init | newly_init)
        p_use = jnp.where(newly_init[:, None], p_new, c_pf)
        if upto == "triangulate":
            return ss.replace(P=ss.P + 0.0 * jnp.sum(p_use))

        H, r, gate_ok, _rp, nd = update.gated_row_stack(
            c_obs, c_mask_inv, p_use, use_track, window, g, ss.P, sigma2_, cfg
        )
        if upto == "rows":
            return ss.replace(P=ss.P + 0.0 * (jnp.sum(H) + jnp.sum(r)))
        ss2 = update.measurement_update(ss, H, r, sigma2_, cfg)
        return ss2

    for part in ("find", "compactcand", "triangulate", "rows", "all"):
        entries[f"prune_sub_{part}"] = (
            lambda s, part=part: vm(lambda ss: _prune_parts(ss, part))(s)
        )

    results = {}
    for name, fn in entries.items():
        if args.only and args.only not in name:
            continue

        def looped(s, fn=fn):
            def body(carry, _):
                out = fn(carry)
                # Keep P/state flowing so iterations can't be CSE'd/elided.
                return out, ()

            out, _ = jax.lax.scan(body, s, None, length=args.iters)
            return out

        jfn = jax.jit(looped)
        try:
            t0 = time.perf_counter()
            out = jfn(state)
            jax.block_until_ready(out)
            compile_and_first = time.perf_counter() - t0
            t0 = time.perf_counter()
            out = jfn(state)
            jax.block_until_ready(out)
            dt = time.perf_counter() - t0
        except Exception as e:  # noqa: BLE001
            log(f"{name:22s} FAILED: {type(e).__name__}: {e}")
            continue
        per = (dt) / args.iters
        results[name] = per
        log(f"{name:22s} {per*1e3:9.2f} ms/iter   (compile+1st {compile_and_first:.1f}s)")

    log("")
    log(f"batch={B} iters={args.iters}")
    for k, v in sorted(results.items(), key=lambda kv: -kv[1]):
        log(f"  {k:22s} {v*1e3:9.2f} ms")


if __name__ == "__main__":
    main()
