#!/usr/bin/env python
"""Mixed-precision measurement on the live TPU (BASELINE config 3).

Runs the bench shape at each matmul-precision tier and records throughput +
accuracy drift into MIXED_PRECISION.md. The reference ships float32
(MSCKF<float>, asl_msckf.cpp:57) with a scalar-templated core (README.md:47);
the TPU analogue of that knob is the MXU pass count for f32 contractions:

  highest  = 6-pass bf16 (true f32 accumulation)   — the default
  high     = 3-pass bf16 (~f32 products, bf16-ish cross terms)
  default  = 1-pass bf16 (8-bit mantissa)

Round-2 established qualitatively that 'default' destroys the covariance
algebra; this tool turns that into a measured table.

Usage: python tools/mixed_precision_tpu.py [--batch 256] [--frames 100]
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--frames", type=int, default=100)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--out", default=os.path.join(REPO, "MIXED_PRECISION.md"))
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from msckf_mono_tpu.core.init import ground_truth_init
    from msckf_mono_tpu.data import synthetic
    from msckf_mono_tpu.eval.ate import ate_rmse
    from msckf_mono_tpu.parallel import montecarlo, sharding
    from msckf_mono_tpu.utils.config import MsckfConfig

    rows = []
    for prec in ("highest", "high", "default"):
        cfg = MsckfConfig()
        cfg = dataclasses.replace(
            cfg,
            filter=dataclasses.replace(
                cfg.filter, fused_updates=True, matmul_precision=prec
            ),
        )
        seq = synthetic.generate(cfg, n_frames=args.frames, seed=0, pixel_noise=0.5)
        frames = synthetic.to_frame_inputs(seq, jnp.float32)
        imu = ground_truth_init(
            p_I_G=[5.0, 0.0, 0.0], q_IG=[1, 0, 0, 0],
            v_I_G=[0.0, 5.0 * 0.35, 0.2 * 1.4], b_g=seq.b_g, b_a=seq.b_a,
            dtype=jnp.float32,
        )
        states = montecarlo.make_fleet(cfg, imu, args.batch, dtype=jnp.float32)
        bframes = montecarlo.broadcast_frames(frames, args.batch)
        mesh = sharding.make_mesh()
        run = sharding.make_sharded_run(cfg, mesh)
        states = sharding.shard_batch(states, mesh)

        t0 = time.perf_counter()
        final, outs, metrics = run(states, bframes)
        np.asarray(jax.device_get(final.imu.q_IG[:1]))
        compile_s = time.perf_counter() - t0

        times = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            final, outs, metrics = run(states, bframes)
            np.asarray(jax.device_get(final.imu.q_IG[:1]))
            times.append(time.perf_counter() - t0)
        dt = min(times)
        fps = args.batch * args.frames / dt

        est = np.asarray(outs.p_I_G[:, 0])
        finite = bool(np.isfinite(est).all())
        ate = float(ate_rmse(est, seq.gt_p)) if finite else float("nan")
        mean_cov = float(metrics["mean_pos_cov_trace"])
        rows.append((prec, fps, ate, finite, mean_cov, compile_s))
        log(f"{prec:8s} {fps:8.1f} f/s  ATE {ate:.3f} m  finite={finite} "
            f"mean_pos_cov_trace={mean_cov:.3f}  (compile+1st {compile_s:.0f}s)")

    dev = jax.devices()[0]
    with open(args.out, "w") as f:
        f.write(
            "# Mixed precision on TPU (BASELINE config 3)\n\n"
            f"Measured on {dev}, batch={args.batch}, frames={args.frames}, "
            f"f32 state, fused_updates=True "
            f"({time.strftime('%Y-%m-%d %H:%M')}).\n\n"
            "The filter state stays f32; `matmul_precision` picks the MXU "
            "bf16 pass count for every contraction in the frame step (the "
            "TPU analogue of the reference's scalar template, README.md:47; "
            "the reference ships f32, asl_msckf.cpp:57).\n\n"
            "| matmul_precision | frame-steps/s | ATE (m) | finite | mean pos-cov trace |\n"
            "|---|---|---|---|---|\n"
        )
        for prec, fps, ate, finite, mc, _cs in rows:
            f.write(f"| {prec} | {fps:.1f} | {ate:.3f} | {finite} | {mc:.3f} |\n")
        f.write(
            "\nReading: 'highest' (6-pass, true f32) is the shipped default. "
            "A tier is usable only if ATE stays within the bench gate "
            "(0.45 m) AND the covariance stays consistent; see the table "
            "for what the cheaper tiers actually do to the filter.\n"
        )
    log(f"wrote {args.out}")


if __name__ == "__main__":
    main()
