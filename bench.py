#!/usr/bin/env python
"""Benchmark: batched MSCKF throughput on one chip.

Runs a fleet of independent filters (Monte-Carlo perturbed inits) through a
synthetic EuRoC-rate VIO sequence (20 Hz camera / 200 Hz IMU) and reports
aggregate frame-steps per second.

Baseline: the reference (daniilidis-group/msckf_mono) is a single-threaded
real-time system — one filter at 20 frames/s (BASELINE.md "implied per-frame
budget", /root/reference/datasets/asl_msckf.cpp:199-200,472). ``vs_baseline``
is therefore (aggregate frames/s) / 20: how many reference-equivalent
real-time filters one chip sustains.

Prints exactly ONE JSON line on stdout; diagnostics go to stderr. If the
target shape fails and a smaller shape is measured instead, the JSON ``unit``
field says so LOUDLY (round-2 postmortem: a silent fallback to batch 256
masked a batch-1024 crash).
"""

import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))

# Accuracy gate: zero the score if ATE exceeds this. Round-2 value was 2.0 m
# while the measured ATE is ~0.21 m — loose enough to ship a 5x accuracy
# regression. 2x the nominal value trips on any real numerics bug.
ATE_GATE_M = 0.45


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--frames", type=int, default=200)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--chunk", type=int, default=0,
                    help="frames per device call; 0 = auto (short calls keep "
                         "the tunneled TPU inside its RPC deadline)")
    ap.add_argument("--platform", default=None, help="force jax platform (cpu/tpu)")
    ap.add_argument("--stages", action="store_true",
                    help="also print a per-stage device-time breakdown "
                         "(eval/timing.py, the StageTiming telemetry analogue) "
                         "to stderr and PROF_STAGES.txt")
    ap.add_argument("--images", action="store_true",
                    help="image-in-the-loop mode (BASELINE config 4): rendered "
                         "pixels -> Pallas FAST/KLT front-end -> filter, all "
                         "on device (the reference's live pipeline, "
                         "ros_interface.cpp:48-120)")
    ap.add_argument("--independent-streams", action="store_true",
                    help="with --images: give every filter its own front-end "
                         "instead of the Monte-Carlo shared-camera default "
                         "(shared lets XLA hoist image-only work — pyramid, "
                         "FAST — out of the batch)")
    ap.add_argument("--_worker", action="store_true", help=argparse.SUPPRESS)
    ap.add_argument("--timeout", type=int, default=1500,
                    help="watchdog seconds per attempt (tunneled TPUs can wedge)")
    args = ap.parse_args()

    if not args._worker:
        return _supervise(args)

    import jax

    # Persistent compilation cache: retries and fallback tiers skip
    # recompiles within a session (cross-session hits depend on the tunnel).
    # min_compile_time 0.0 (was 1.0): on the tunneled TPU EVERY compile —
    # even a broadcast_in_dim — pays a ~0.45 s RPC round-trip, and the
    # round-3 "95 s compile each invocation" was ~120 tiny setup ops below
    # the old threshold missing the cache every run (measured r4: the big
    # scanned program was HITTING all along).
    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    # Cache hit/miss telemetry (VERDICT r4 item 8): the reported JSON says
    # whether this invocation's programs came from the persistent cache and
    # how much compile time the cache saved vs. paid retrieving.
    cache_stats = {"hits": 0, "misses": 0, "retrieval_s": 0.0, "saved_s": 0.0}

    def _on_event(event, **kw):
        if event == "/jax/compilation_cache/cache_hits":
            cache_stats["hits"] += 1
        elif event == "/jax/compilation_cache/cache_misses":
            cache_stats["misses"] += 1

    def _on_duration(event, dur, **kw):
        if event == "/jax/compilation_cache/cache_retrieval_time_sec":
            cache_stats["retrieval_s"] += dur
        elif event == "/jax/compilation_cache/compile_time_saved_sec":
            cache_stats["saved_s"] += dur

    jax.monitoring.register_event_listener(_on_event)
    jax.monitoring.register_event_duration_secs_listener(_on_duration)
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from msckf_mono_tpu.core.init import ground_truth_init
    from msckf_mono_tpu.data import synthetic
    from msckf_mono_tpu.eval.ate import ate_rmse
    from msckf_mono_tpu.parallel import montecarlo, sharding
    from msckf_mono_tpu.utils.config import MsckfConfig

    import dataclasses

    cfg = MsckfConfig()
    # Serving configuration: one fused marginalize+prune EKF update per frame
    # (see FilterConfig.fused_updates; strict-parity ordering costs ~15% more).
    # MSCKF_MATMUL_PRECISION overrides the matmul tier (MIXED_PRECISION.md
    # has the measured accuracy/throughput table per tier).
    prec = os.environ.get("MSCKF_MATMUL_PRECISION", cfg.filter.matmul_precision)
    cfg = dataclasses.replace(
        cfg,
        filter=dataclasses.replace(cfg.filter, fused_updates=True,
                                   matmul_precision=prec,
                                   gating_precision="high"),
    )
    dev = jax.devices()[0]
    n_dev = jax.device_count()
    if args.batch % n_dev != 0:
        args.batch = max(args.batch // n_dev, 1) * n_dev
        log(f"batch snapped to {args.batch} (multiple of {n_dev} devices)")
    # The staged-row pipeline's peak HBM scales with batch × staged_chunk
    # (see update.gated_row_stack); keep that product ~8k so batch 1024 fits
    # in v5e HBM while small batches keep the low sequential depth of the
    # unchunked path. Computed from the post-snap batch (ADVICE r2).
    # floor 2 (was 8): at batch >= 8192 the (B, C, 2N-3, D) row-pipeline
    # temps are the HBM ceiling (measured OOM at 17.2/15.75 G with C=8);
    # C=2 fits 8k+ fleets, and batches <= 1024 keep C=8 as before.
    chunk_s = max(2, 8192 // max(args.batch, 1))
    # max_staged=8 here: the bench's synthetic world has MEASURED per-frame
    # track deaths of mean 0.9 / max 4 (the library default keeps 16 for
    # real data's burst behavior); diag.staged_overflow in the JSON would
    # expose any violation.
    # Obs-width caps from measured distributions (tools/measure_row_stats.py
    # at 256x200: prune-candidate involved obs == 2 at p99.9 AND at max —
    # the selection is 0-or->=2 (msckf.h:1092-1094) and bounded by the
    # window's overshoot past max_cam_states, which is 1 augment/frame at
    # steady state, so marks are 2/frame on this world; marginalized obs
    # <= 21): prune rows 53 -> 1, marg rows 53 -> 41 per staged track.
    # diag.row_overflow counts any rows the caps cost.
    # prune_chunk: with prune_obs_cap=2 each candidate pays ONE buffer row
    # (2*2-3) instead of 53, so the prune sweep can chunk ~50x larger at the
    # same peak HBM — one scan step for all 48 candidates at batch <= 1024
    # (PROF_STAGES.txt: 2.7% MFU / 48% BW at these shapes).
    # Divisors of 48 so gated_row_stack's divisibility snap never shrinks it.
    pchunk = {1024: 48, 2048: 24, 4096: 12}.get(
        max(args.batch, 1024) if args.batch <= 1024 else args.batch, 6)
    cfg = dataclasses.replace(
        cfg, shapes=dataclasses.replace(cfg.shapes, staged_chunk=chunk_s,
                                        max_staged=8, prune_obs_cap=2,
                                        marg_obs_cap=22, prune_chunk=pchunk)
    )
    log(f"device: {dev}, batch={args.batch}, frames={args.frames}")

    if args.images:
        return _run_images(args, cfg)

    seq = synthetic.generate(cfg, n_frames=args.frames, seed=0, pixel_noise=0.5)
    frames = synthetic.to_frame_inputs(seq, jnp.float32)

    imu = ground_truth_init(
        p_I_G=[5.0, 0.0, 0.0],
        q_IG=[1, 0, 0, 0],
        v_I_G=[0.0, 5.0 * 0.35, 0.2 * 1.4],
        b_g=seq.b_g,
        b_a=seq.b_a,
        dtype=jnp.float32,
    )

    mesh = sharding.make_mesh()
    from jax.sharding import NamedSharding, PartitionSpec as P

    batch_sharding = NamedSharding(mesh, P(sharding.FILTER_AXIS))

    # Fleet construction as ONE jitted program (out-sharded over the mesh):
    # the eager tree_map version dispatched ~30 tiny broadcast ops, each a
    # ~0.45 s tunnel round-trip (round-4 compile-time postmortem).
    B = args.batch
    states = jax.jit(
        lambda k: montecarlo.make_fleet(cfg, imu, B, key=k, dtype=jnp.float32),
        out_shardings=batch_sharding,
    )(jax.random.PRNGKey(0))

    # Frames stay UNBATCHED on device ((T, ...), a few MB); the per-chunk
    # slice AND the share-across-filters broadcast happen inside the jitted
    # chunk runner below — one compiled program total, vs. per-chunk eager
    # slicing (~100 tiny compiles) + a host-side (T, B, ...) broadcast.
    frames_dev = jax.device_put(frames, NamedSharding(mesh, P()))

    if args.chunk > 0:
        chunk = args.chunk
    else:
        # Auto: keep each device call under ~20 s of estimated execution so
        # the tunneled TPU's RPC watchdog never fires mid-call (round-2's
        # batch-1024 "kernel fault" was a multi-minute single call; see
        # VERDICT r2 item 1). Measured wall ~200 ms/frame for the whole
        # batch at 256, ~linear in batch.
        est_wall_ms_per_frame = 200.0 * max(args.batch, 64) / 256.0
        chunk = max(10, min(50, int(20000 / est_wall_ms_per_frame)))
    chunk = min(chunk, args.frames)
    # Snap chunk to a divisor of frames so fallback tiers with reduced frame
    # counts can never die on the divisibility assert (round-1 postmortem).
    while args.frames % chunk != 0:
        chunk -= 1
    n_chunks = args.frames // chunk

    run = sharding.batched_run_sequence(cfg)

    @jax.jit
    def run_chunk(states, frames_full, start):
        cf = jax.tree_util.tree_map(
            lambda x: jax.lax.dynamic_slice_in_dim(x, start, chunk, 0),
            frames_full,
        )
        bf = jax.tree_util.tree_map(
            lambda x: jax.lax.with_sharding_constraint(
                jnp.broadcast_to(x[:, None], (chunk, B) + x.shape[1:]),
                NamedSharding(mesh, P(None, sharding.FILTER_AXIS)),
            ),
            cf,
        )
        final, outs = run(states, bf)
        return final, outs.p_I_G[:, 0], sharding.fleet_metrics(final)

    def run_all(states):
        outs_list = []
        metrics = None
        for c in range(n_chunks):
            states, p0, metrics = run_chunk(
                states, frames_dev, jnp.asarray(c * chunk, jnp.int32)
            )
            outs_list.append(p0)  # filter-0 trajectory, on device
            # Force a real host transfer per chunk: on the tunneled TPU,
            # block_until_ready can return before execution completes, and
            # execution faults only surface at transfer time — a tiny
            # device_get both bounds each RPC's outstanding work and
            # surfaces faults inside the watchdog window.
            np.asarray(jax.device_get(states.imu.q_IG[:1]))
        return states, outs_list, metrics

    log(f"compiling... ({n_chunks} chunk(s) of {chunk} frames)")
    t0 = time.perf_counter()
    final, outs_list, metrics = run_all(states)
    compile_plus_first = time.perf_counter() - t0
    log(f"compile+first run: {compile_plus_first:.1f}s")

    times = []
    for _ in range(args.reps):
        t0 = time.perf_counter()
        final, outs_list, metrics = run_all(states)
        times.append(time.perf_counter() - t0)
    dt = min(times)

    frame_steps_per_s = args.batch * args.frames / dt
    rt_equiv = frame_steps_per_s / 20.0

    # accuracy sanity on filter 0 (finiteness FIRST: a diverged trajectory
    # makes the Umeyama SVD in ate_rmse throw on host)
    est = np.concatenate([np.asarray(o) for o in outs_list])
    finite = bool(np.isfinite(est).all())
    ate = ate_rmse(est, seq.gt_p) if finite else float("inf")
    metrics = {k: float(v) for k, v in metrics.items()}
    log(f"run time best of {args.reps}: {dt:.3f}s; ATE(filter0)={ate:.3f} m")
    log(f"metrics: {metrics}")
    gate_note = ""
    if not finite or ate > ATE_GATE_M:
        log(f"WARNING: accuracy gate tripped (ATE {ate:.3f} > {ATE_GATE_M}); value zeroed")
        frame_steps_per_s = 0.0
        rt_equiv = 0.0
        gate_note = f"; ACCURACY GATE TRIPPED ATE={ate:.3f}m"

    if args.stages:
        from msckf_mono_tpu.core import filter as mf, augment, tracks
        from msckf_mono_tpu.eval import timing

        # Mid-sequence batched state + one frame => the same per-stage table
        # the reference publishes as StageTiming (asl_msckf.cpp:207-296).
        frame1 = jax.jit(
            lambda f: jax.tree_util.tree_map(
                lambda x: jnp.broadcast_to(x[-1], (B,) + x.shape[1:]), f
            )
        )(frames_dev)

        def get_staged(s, f):
            s = mf.propagate_block(s, f, cfg)
            s = augment.augment_state(s, f.state_id, f.time, cfg)
            return tracks.update_tracks(s, f.tracked_uv, f.tracked_ids, f.tracked_valid, cfg)

        mstate, staged = jax.jit(jax.vmap(lambda s, f: get_staged(s, f)))(final, frame1)
        table = timing.stage_timing(mstate, frame1, staged, cfg,
                                    reps=max(args.reps, 3), cost=True)
        # TPU v5e (v5 lite) single-core ceilings. The filter runs
        # matmul_precision="highest": each f32 dot lowers to a 6-pass bf16
        # MXU decomposition, so the achievable matmul ceiling is peak/6.
        PEAK_BF16 = 197e12
        PEAK_F32H = PEAK_BF16 / 6.0
        HBM_BW = 819e9
        lines = [
            f"per-stage device cost (batch={args.batch}):",
            f"  {'stage':20s} {'ms':>9s} {'GFLOP':>8s} {'MFU%':>6s} "
            f"{'HBM GB/s':>9s} {'BW%':>5s}",
        ]
        for k in timing.STAGES:
            t_s, fl, by = table[k]
            mfu = fl / t_s / PEAK_F32H * 100.0
            bw = by / t_s / 1e9
            lines.append(
                f"  {k:20s} {t_s*1e3:9.2f} {fl/1e9:8.2f} {mfu:6.1f} "
                f"{bw:9.1f} {bw*1e9/HBM_BW*100:5.1f}"
            )
        lines.append(
            "  (MFU% = stage FLOPs / time / (197 TFLOP/s / 6): the 6-pass "
            "f32-highest MXU ceiling on v5e; BW% vs 819 GB/s HBM)")
        for ln in lines:
            log(ln)
        try:
            if jax.default_backend() != "tpu":
                raise OSError("stage artifact is TPU-only (CPU smoke runs "
                              "must not clobber the committed table)")
            with open(os.path.join(REPO, "PROF_STAGES.txt"), "w") as f:
                f.write(
                    f"# per-stage device cost, {dev}, batch={args.batch}, "
                    f"frames={args.frames} ({time.strftime('%Y-%m-%d %H:%M:%S')})\n"
                    + "\n".join(lines[1:])
                    + f"\n  whole-frame (scan)   {dt/args.frames*1e3:9.2f} ms\n"
                )
        except OSError:
            pass

    print(
        json.dumps(
            {
                "metric": "batched_vio_frame_steps_per_s",
                "value": round(frame_steps_per_s, 1),
                "unit": "frame-steps/s (batch={} filters, 20Hz cam + 200Hz IMU pipeline{})".format(
                    args.batch, gate_note
                ),
                "vs_baseline": round(rt_equiv, 2),
                "diagnostics": {
                    "ate_m": round(float(ate), 4),
                    "compile_plus_first_s": round(compile_plus_first, 1),
                    # compile+first INCLUDES one full measured run; the true
                    # setup cost (trace + cache retrieval + any compile) is
                    # the difference vs the steady-state run time
                    "setup_overhead_s": round(compile_plus_first - dt, 1),
                    "row_overflow": metrics.get("total_row_overflow"),
                    "staged_overflow": metrics.get("total_staged_overflow"),
                    "residualized": metrics.get("total_residualized"),
                    "compile_cache": {
                        "hits": cache_stats["hits"],
                        "misses": cache_stats["misses"],
                        "retrieval_s": round(cache_stats["retrieval_s"], 1),
                        "compile_time_saved_s": round(cache_stats["saved_s"], 1),
                    },
                },
            }
        )
    )


def _run_images(args, cfg):
    """Image-in-the-loop benchmark: pixels -> FAST/KLT -> filter on device.

    B independent camera streams (shared image CONTENT broadcast inside jit
    — per-stream front-end compute is identical either way, but only one
    (T, H, W) stack crosses the host->device tunnel). Reports
    image-frame-steps/s: each step includes pyramid build, Pallas KLT
    tracking, FAST+Shi-Tomasi detection, and the full filter frame.
    """
    import jax
    import jax.numpy as jnp

    from msckf_mono_tpu.core import pipeline
    from msckf_mono_tpu.core.init import ground_truth_init
    from msckf_mono_tpu.data import render, synthetic
    from msckf_mono_tpu.eval.ate import ate_rmse
    from msckf_mono_tpu.frontend import functional
    from msckf_mono_tpu.parallel import montecarlo

    B = args.batch
    T = args.frames
    H, W = cfg.camera.height, cfg.camera.width
    # Serving front-end: window 21 / 4 pyramid levels. The reference runs
    # 51 / 5 levels (corner_detector.cpp:206); CV_PARITY.json measures our
    # window-31 tracker ≥99.8% within 0.5 px of cv2-at-51, and the
    # KLT_WINDOW_AB sweep (tools, round 4) measures the end-to-end ATE of
    # 21 vs 31 vs 51 on this world. Override for experiments:
    # MSCKF_KLT_WINDOW / MSCKF_KLT_LEVELS.
    fcfg = functional.FrontendConfig(
        max_features=64,
        window_size=int(os.environ.get("MSCKF_KLT_WINDOW", 21)),
        max_level=int(os.environ.get("MSCKF_KLT_LEVELS", 4)) - 1,
        # serving tier for the image-domain matmuls (pyramid, Shi-Tomasi):
        # 1-pass bf16; the printed ATE carries the accuracy cost, "highest"
        # reproduces the exact-f32 parity path
        image_precision=os.environ.get("MSCKF_IMAGE_PRECISION", "default"),
    )

    seq, world = synthetic.generate(
        cfg, n_frames=T, seed=0, pixel_noise=0.0, n_landmarks=500,
        return_world=True,
    )
    t0 = time.perf_counter()
    imgs = np.stack([render.render_frame(cfg, world, i) for i in range(T)])
    log(f"rendered {T} frames ({H}x{W}) in {time.perf_counter()-t0:.1f}s")

    imu = ground_truth_init(
        p_I_G=[5.0, 0.0, 0.0], q_IG=[1, 0, 0, 0],
        v_I_G=[0.0, 5.0 * 0.35, 0.2 * 1.4], b_g=seq.b_g, b_a=seq.b_a,
        dtype=jnp.float32,
    )
    states = jax.jit(
        lambda k: montecarlo.make_fleet(cfg, imu, B, key=k, dtype=jnp.float32)
    )(jax.random.PRNGKey(0))
    fstate = functional.init_frontend_state(H, W, fcfg)
    fstates = jax.jit(
        lambda f: jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x, (B,) + x.shape), f
        )
    )(fstate)

    imgs_d = jnp.asarray(np.asarray(imgs, np.float32))  # (T, H, W) on device once
    om = jnp.asarray(np.asarray(seq.imu_omega, np.float32))     # (T, K, 3)
    ac = jnp.asarray(np.asarray(seq.imu_acc, np.float32))
    dt_ = jnp.asarray(np.asarray(seq.imu_dt, np.float32))
    tm = jnp.asarray(np.asarray(seq.time, np.float32))

    if args.independent_streams:
        run = pipeline.batched_run_images(cfg, fcfg)
    else:
        run = pipeline.batched_run_images_shared(cfg, fcfg)

    chunk = min(args.chunk if args.chunk > 0 else 10, T)
    while T % chunk:
        chunk -= 1
    n_chunks = T // chunk

    sid = jnp.arange(1, T + 1, dtype=jnp.int32)

    @jax.jit
    def run_chunk(states, fstates, imgs_a, om_a, ac_a, dt_a, sid_a, tm_a, start):
        # chunk slicing INSIDE the jitted program (traced start): eager
        # per-chunk slices each paid the ~0.45 s tunnel compile round-trip.
        # The full arrays are passed as ARGUMENTS — closing over the (T,H,W)
        # image stack embeds a ~300 MB constant in the program, which the
        # tunnel's remote-compile endpoint rejects (HTTP 413).
        def sl(x):
            return jax.lax.dynamic_slice_in_dim(x, start, chunk, 0)

        def b(x):
            return jnp.broadcast_to(x[:, None], (chunk, B) + x.shape[1:])

        img_c = sl(imgs_a)
        if args.independent_streams:
            # Per-stream DISTINCT pixels: a deterministic brightness offset
            # per stream defeats XLA's broadcast-algebra rewrites, which
            # otherwise collapse the "independent" per-stream pyramid/FAST/
            # Shi-Tomasi work back to shared-camera compute (measured round
            # 5: the isolated per-stream pyramid stage alone costs more than
            # the whole broadcast-content frame step). The offset rides
            # fused into consumers — no (chunk, B, H, W) buffer
            # materializes — and is geometry-neutral, so ATE stays
            # meaningful.
            jit_b = (jnp.arange(B, dtype=jnp.float32) % 7.0) * 0.5
            img_b = b(img_c) + jit_b[None, :, None, None]
        frames = pipeline.ImageFrameInput(
            image=img_b if args.independent_streams else img_c,
            imu_omega=b(sl(om_a)), imu_acc=b(sl(ac_a)), imu_dt=b(sl(dt_a)),
            state_id=b(sl(sid_a)), time=b(sl(tm_a)),
            frame_valid=jnp.ones((chunk, B), bool),
        )
        return run(states, fstates, frames)

    def run_all(states, fstates):
        outs_list = []
        for c in range(n_chunks):
            states, fstates, outs = run_chunk(
                states, fstates, imgs_d, om, ac, dt_, sid, tm,
                jnp.asarray(c * chunk, jnp.int32),
            )
            outs_list.append(outs.p_I_G[:, 0])
            np.asarray(jax.device_get(states.imu.q_IG[:1]))
        return states, fstates, outs_list

    log(f"compiling image pipeline... ({n_chunks} chunk(s) of {chunk} frames, batch {B})")
    t0 = time.perf_counter()
    final, ffinal, outs_list = run_all(states, fstates)
    log(f"compile+first run: {time.perf_counter() - t0:.1f}s")

    times = []
    for _ in range(args.reps):
        t0 = time.perf_counter()
        final, ffinal, outs_list = run_all(states, fstates)
        times.append(time.perf_counter() - t0)
    dt = min(times)

    est = np.concatenate([np.asarray(o) for o in outs_list])
    finite = bool(np.isfinite(est).all())
    ate = ate_rmse(est, seq.gt_p) if finite else float("inf")
    fps = B * T / dt
    log(f"run time best of {args.reps}: {dt:.3f}s; ATE(filter0)={ate:.3f} m")
    value = round(fps, 1)
    if not finite or ate > ATE_GATE_M:
        log(f"WARNING: accuracy gate tripped (ATE {ate:.3f} > {ATE_GATE_M}); value zeroed")
        value = 0.0
    print(json.dumps({
        "metric": "image_in_loop_frame_steps_per_s",
        "value": value,
        "unit": ("image-frame-steps/s (batch={} {}, {}x{} px, pyramid+KLT"
                 "+FAST on device + full filter)").format(
                     B,
                     "independent streams" if args.independent_streams
                     else "Monte-Carlo filters, one shared camera",
                     H, W),
        "vs_baseline": round(value / 20.0, 2),
        "diagnostics": {"ate_m": round(float(ate), 4)},
    }))


def _supervise(args):
    """Run the bench in a watchdog subprocess.

    The tunneled TPU can wedge globally (hangs on any transfer, recovery
    takes minutes). Attempt the TARGET shape with a hard timeout; retry it
    once (device recovery) before degrading, and make any degradation LOUD
    in the reported JSON (round-2 postmortem: the silent fallback hid that
    batch 1024 never ran).
    """
    attempts = [
        ("target", args.platform, args.batch, args.frames, args.timeout),
        ("target-retry", args.platform, args.batch, args.frames, args.timeout),
        ("degraded-batch", args.platform, max(args.batch // 4, 8),
         max(args.frames // 2, 20), args.timeout),
        ("cpu-fallback", "cpu", min(args.batch, 16), min(args.frames, 40),
         args.timeout),
    ]
    failures = []
    for name, platform, batch, frames, timeout in attempts:
        cmd = [
            sys.executable, "-u", os.path.abspath(__file__),
            "--_worker",
            "--batch", str(batch),
            "--frames", str(frames),
            "--reps", str(args.reps),
            "--chunk", str(args.chunk),
        ]
        if platform:
            cmd += ["--platform", platform]
        if args.stages:
            cmd += ["--stages"]
        if args.images:
            cmd += ["--images"]
        if args.independent_streams:
            cmd += ["--independent-streams"]
        log(f"bench attempt [{name}]: platform={platform or 'default'} "
            f"batch={batch} frames={frames}")
        try:
            proc = subprocess.run(
                cmd, stdout=subprocess.PIPE, timeout=timeout, cwd=REPO,
            )
        except subprocess.TimeoutExpired:
            log(f"bench attempt [{name}] timed out after {timeout}s (wedged device?)")
            failures.append(f"{name}(batch={batch}):timeout{timeout}s")
            continue
        out = proc.stdout.decode().strip().splitlines()
        if proc.returncode == 0 and out:
            rec = json.loads(out[-1])
            if failures:
                rec["unit"] += "; FALLBACK after failed attempts: " + ", ".join(failures)
            print(json.dumps(rec), flush=True)
            return
        log(f"bench attempt [{name}] failed rc={proc.returncode}")
        failures.append(f"{name}(batch={batch}):rc={proc.returncode}")
    metric = ("image_in_loop_frame_steps_per_s" if args.images
              else "batched_vio_frame_steps_per_s")
    print(json.dumps({
        "metric": metric,
        "value": 0.0,
        "unit": "frame-steps/s; ALL ATTEMPTS FAILED: " + ", ".join(failures),
        "vs_baseline": 0.0,
    }), flush=True)


if __name__ == "__main__":
    main()
