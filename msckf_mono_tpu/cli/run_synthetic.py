#!/usr/bin/env python
"""Run a batched Monte-Carlo fleet on a synthetic sequence.

The offline-runner equivalent of /root/reference/datasets/asl_msckf.cpp for
the no-dataset case: generates a synthetic world, runs B perturbed filters as
one compiled program, and reports ATE statistics + throughput.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--frames", type=int, default=200)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--pixel-noise", type=float, default=0.5)
    ap.add_argument("--perturb", action="store_true", help="Monte-Carlo perturbed inits")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--f64", action="store_true")
    ap.add_argument("--out", type=str, default=None, help="write trajectory .npz")
    args = ap.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if args.f64:
        jax.config.update("jax_enable_x64", True)

    import jax.numpy as jnp
    import numpy as np

    from msckf_mono_tpu.core.init import ground_truth_init
    from msckf_mono_tpu.data import synthetic
    from msckf_mono_tpu.eval.ate import ate_rmse, final_drift
    from msckf_mono_tpu.parallel import montecarlo, sharding
    from msckf_mono_tpu.utils.config import MsckfConfig

    cfg = MsckfConfig()
    dtype = jnp.float64 if args.f64 else jnp.float32

    seq = synthetic.generate(cfg, n_frames=args.frames, seed=args.seed,
                             pixel_noise=args.pixel_noise)
    frames = synthetic.to_frame_inputs(seq, dtype)
    # init at the trajectory start (frame inputs begin after the first IMU block)
    imu = ground_truth_init(
        p_I_G=[5.0, 0.0, 0.0], q_IG=[1, 0, 0, 0],
        v_I_G=[0.0, 5.0 * 0.35, 0.2 * 1.4],
        b_g=seq.b_g, b_a=seq.b_a, dtype=dtype,
    )

    sigmas = {} if args.perturb else dict(sigma_p=0, sigma_v=0, sigma_theta=0, sigma_bg=0, sigma_ba=0)
    states = montecarlo.make_fleet(cfg, imu, args.batch, dtype=dtype, **sigmas)
    batch_frames = montecarlo.broadcast_frames(frames, args.batch)

    mesh = sharding.make_mesh()
    run = sharding.make_sharded_run(cfg, mesh)
    states = sharding.shard_batch(states, mesh)

    t0 = time.perf_counter()
    final, outs, metrics = run(states, batch_frames)
    jax.block_until_ready(final.P)
    wall = time.perf_counter() - t0

    est = np.asarray(outs.p_I_G)  # (T, B, 3)
    ates = [ate_rmse(est[:, b], seq.gt_p) for b in range(min(args.batch, 64))]
    drifts = [final_drift(est[:, b], seq.gt_p) for b in range(min(args.batch, 64))]

    report = {
        "batch": args.batch,
        "frames": args.frames,
        "wall_s": round(wall, 3),
        "frame_steps_per_s": round(args.batch * args.frames / wall, 1),
        "ate_mean": float(np.mean(ates)),
        "ate_p90": float(np.percentile(ates, 90)),
        "drift_mean": float(np.mean(drifts)),
        "metrics": {k: float(v) for k, v in metrics.items()},
    }
    print(json.dumps(report, indent=2))

    if args.out:
        np.savez(args.out, est=est, gt=seq.gt_p, time=seq.time)
        print(f"wrote {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
