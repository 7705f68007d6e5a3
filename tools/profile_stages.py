#!/usr/bin/env python
"""Per-stage device timing of the batched frame step.

Answers "where does the frame time go" (VERDICT r1 item 2): each pipeline
stage is jitted and timed in isolation on a realistic mid-sequence state
(window full, tracks live), batched over --batch filters. Stage boundaries
mirror the reference's StageTiming telemetry
(/root/reference/datasets/asl_msckf.cpp:207-296).

Usage: python tools/profile_stages.py [--batch 256] [--platform tpu] [--reps 5]
"""

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
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--warm-frames", type=int, default=30)
    args = ap.parse_args()

    import jax

    # Persistent compilation cache: crashed/killed attempts don't re-pay the
    # 20-90 s per-program compiles on the tunneled TPU (VERDICT r1 weak #7).
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from msckf_mono_tpu.core import augment, filter as mf, prune, tracks, update
    from msckf_mono_tpu.core.init import ground_truth_init
    from msckf_mono_tpu.core.types import init_filter_state
    from msckf_mono_tpu.data import synthetic
    from msckf_mono_tpu.parallel import montecarlo
    from msckf_mono_tpu.utils.config import MsckfConfig

    cfg = MsckfConfig()
    B = args.batch
    log(f"device={jax.devices()[0]} batch={B}")

    seq = synthetic.generate(cfg, n_frames=args.warm_frames + 2, seed=0, pixel_noise=0.5)
    frames = synthetic.to_frame_inputs(seq, jnp.float32)

    imu = ground_truth_init(
        p_I_G=[5.0, 0.0, 0.0], q_IG=[1, 0, 0, 0],
        v_I_G=[0.0, 5.0 * 0.35, 0.2 * 1.4], b_g=seq.b_g, b_a=seq.b_a,
        dtype=jnp.float32,
    )
    state0 = init_filter_state(cfg, imu, dtype=jnp.float32)

    # Warm the state to mid-sequence (full window, live tracks) on CPU-logic
    # shapes, then broadcast to the batch.
    warm = jax.tree_util.tree_map(lambda x: x[: args.warm_frames], frames)
    warm_state, _ = jax.jit(lambda s, f: mf.run_sequence(s, f, cfg))(state0, warm)
    frame1 = jax.tree_util.tree_map(lambda x: x[args.warm_frames], frames)

    bstate = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (B,) + x.shape), warm_state
    )
    bframe = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (B,) + x.shape), frame1
    )
    # Materialize (broadcast views confuse donation) and perturb obs so
    # batch elements aren't bit-identical.
    bstate = jax.tree_util.tree_map(jnp.array, bstate)
    bframe = jax.tree_util.tree_map(jnp.array, bframe)

    mp = cfg.filter.matmul_precision

    def with_mp(f):
        def g(*a):
            with jax.default_matmul_precision(mp):
                return f(*a)
        return g

    # Reconstruct marginalize's intermediates for sub-stage timing.
    from msckf_mono_tpu.core import triangulate as tri

    def get_staged(state, frame):
        state = mf.propagate_block(state, frame, cfg)
        state = augment.augment_state(state, frame.state_id, frame.time, cfg)
        state, staged = tracks.update_tracks(
            state, frame.tracked_uv, frame.tracked_ids, frame.tracked_valid, cfg
        )
        return state, staged

    v_get_staged = jax.jit(jax.vmap(with_mp(get_staged)))
    mstate, staged = v_get_staged(bstate, bframe)
    mstate = jax.block_until_ready(mstate)

    def tri_fn(state, staged):
        w = state.window
        return jax.vmap(
            lambda o, om: tri.initialize_position(o, om, w.q_CG, w.p_C_G, cfg.max_gn_cost_norm)
        )(staged.obs, staged.obs_mask)

    def motion_fn(state, staged):
        w = state.window
        return jax.vmap(
            lambda o, om: tri.check_motion(o, om, w.q_CG, w.p_C_G, cfg.filter.translation_threshold)
        )(staged.obs, staged.obs_mask)

    def rows_fn(state, staged):
        w = state.window
        p_f_G, _ = tri_fn(state, staged)
        p_f_G = jnp.nan_to_num(p_f_G)
        return jax.vmap(
            lambda o, om, pf: update.track_projected_rows(o, om, pf, w, state.imu.g, cfg)[:3]
        )(staged.obs, staged.obs_mask, p_f_G)

    def gate_fn(state, staged):
        H_all, r_all, rows_valid = rows_fn(state, staged)
        dof = jnp.sum(staged.obs_mask, axis=1) - 1
        s2 = jnp.asarray(cfg.u_var_prime, jnp.float32)
        return jax.vmap(
            lambda Ho, ro, rv, d: update.gating_test(Ho, ro, rv, state.P, d, s2, cfg)
        )(H_all, r_all, rows_valid, dof)

    def stack_fn(state, staged):
        H_all, r_all, rows_valid = rows_fn(state, staged)
        return update.stack_rows(H_all, r_all, rows_valid & staged.valid[:, None], cfg)

    def meas_update_fn(state, staged):
        H, r, _ = stack_fn(state, staged)
        s2 = jnp.asarray(cfg.u_var_prime, jnp.float32)
        return update.measurement_update(state, H, r, s2, cfg)

    def qr_only_fn(state, staged):
        H, r, _ = stack_fn(state, staged)
        return update.compress_rows(H, r)

    stages = {
        "full_step": jax.vmap(lambda s, f: mf.step(s, f, cfg)[0]),
        "propagate_block(10 imu)": jax.vmap(with_mp(lambda s, f: mf.propagate_block(s, f, cfg))),
        "augment": jax.vmap(with_mp(lambda s, f: augment.augment_state(s, f.state_id, f.time, cfg))),
        "update_tracks": jax.vmap(with_mp(lambda s, f: tracks.update_tracks(
            s, f.tracked_uv, f.tracked_ids, f.tracked_valid, cfg)[0])),
        "add_features": jax.vmap(with_mp(lambda s, f: tracks.add_features(
            s, f.new_uv, f.new_ids, f.new_valid, cfg))),
        "marginalize(total)": jax.vmap(with_mp(lambda s, st: update.marginalize(s, st, cfg))),
        "  sub:check_motion": jax.vmap(with_mp(motion_fn)),
        "  sub:triangulate_LM": jax.vmap(with_mp(tri_fn)),
        "  sub:projected_rows(+tri)": jax.vmap(with_mp(rows_fn)),
        "  sub:gating(+rows+tri)": jax.vmap(with_mp(gate_fn)),
        "  sub:stack_rows(+rows+tri)": jax.vmap(with_mp(stack_fn)),
        "  sub:meas_update(+stack..)": jax.vmap(with_mp(meas_update_fn)),
        "  sub:qr_compress(+stack..)": jax.vmap(with_mp(qr_only_fn)),
        "prune_redundant": jax.vmap(with_mp(lambda s: prune.prune_redundant_states(s, cfg))),
        "prune_empty": jax.vmap(with_mp(lambda s: prune.prune_empty_states(s, cfg))),
    }

    results = {}
    for name, fn in stages.items():
        if name in ("full_step", "propagate_block(10 imu)", "augment",
                    "update_tracks", "add_features"):
            fargs = (bstate, bframe)
        elif name in ("marginalize(total)", "  sub:check_motion", "  sub:triangulate_LM",
                      "  sub:projected_rows(+tri)", "  sub:gating(+rows+tri)",
                      "  sub:stack_rows(+rows+tri)", "  sub:meas_update(+stack..)",
                      "  sub:qr_compress(+stack..)"):
            fargs = (mstate, staged)
        else:
            fargs = (mstate,)
        # axon gotcha: block_until_ready can return before execution
        # completes — only a host transfer truly synchronizes. Queue `reps`
        # async dispatches back-to-back, then device_get one tiny leaf; the
        # transfer depends on the last dispatch, so it syncs the whole chain.
        def sync(out):
            leaf = jax.tree_util.tree_leaves(out)[0]
            np.asarray(jax.device_get(leaf.ravel()[:1]))

        jfn = jax.jit(fn)
        try:
            out = jfn(*fargs)  # compile + first run
            sync(out)
            # measure RTT of an already-computed value
            t0 = time.perf_counter()
            sync(out)
            rtt = time.perf_counter() - t0
            t0 = time.perf_counter()
            for _ in range(args.reps):
                out = jfn(*fargs)
            sync(out)
            dt = max(time.perf_counter() - t0 - rtt, 1e-9) / args.reps
            results[name] = dt
            log(f"{name:32s} {dt*1e3:9.2f} ms   ({dt*1e3/B*1000:8.1f} us/filter)")
        except Exception as e:  # noqa: BLE001
            log(f"{name:32s} FAILED: {type(e).__name__}: {e}")

    log("-" * 60)
    total = results.get("full_step", float("nan"))
    log(f"full_step: {total*1e3:.2f} ms -> {B/total:.0f} frame-steps/s")


if __name__ == "__main__":
    main()
