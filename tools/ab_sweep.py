"""A/B sweep: serving-config accuracy cost at the bench shape (VERDICT r4
items 4+5).

The serving config caps static buffers (max_staged=8, max_update_rows=192,
max_tri_prune=16) and runs gating einsums at "high" precision; the reference
drops nothing (msckf.h:336-449 updates every staged track) and our strict
config gates at "highest". This sweep measures what those choices cost in
accuracy at the benchmark shape (batch x frames on the real TPU), reporting
fleet-mean ATE, filter-0 ATE, overflow counters, throughput, and gating
rejects per cell. Writes AB_SWEEP.json at the repo root.

Run serially on the TPU (one process!):  python tools/ab_sweep.py
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp  # noqa: E402

from msckf_mono_tpu.core.init import ground_truth_init  # noqa: E402
from msckf_mono_tpu.data import synthetic  # noqa: E402
from msckf_mono_tpu.eval.ate import ate_rmse  # noqa: E402
from msckf_mono_tpu.parallel import montecarlo, sharding  # noqa: E402
from msckf_mono_tpu.utils.config import MsckfConfig  # noqa: E402

B = int(os.environ.get("AB_BATCH", 1024))
T = int(os.environ.get("AB_FRAMES", 200))
REPS = 2
CHUNK = 25


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def serving_cfg(**over):
    """The bench serving config (bench.py) with field overrides."""
    cfg = MsckfConfig()
    fover = {"gating_precision": over.pop("gating_precision", "high")}
    cfg = dataclasses.replace(
        cfg,
        filter=dataclasses.replace(cfg.filter, fused_updates=True, **fover),
    )
    shapes = dict(staged_chunk=max(8, 8192 // B), max_staged=8)
    shapes.update(over)
    return dataclasses.replace(
        cfg, shapes=dataclasses.replace(cfg.shapes, **shapes)
    )


def run_cell(name, cfg, seq, frames):
    mesh = sharding.make_mesh()
    from jax.sharding import NamedSharding, PartitionSpec as P

    batch_sharding = NamedSharding(mesh, P(sharding.FILTER_AXIS))
    imu = ground_truth_init(
        p_I_G=[5.0, 0.0, 0.0], q_IG=[1, 0, 0, 0],
        v_I_G=[0.0, 5.0 * 0.35, 0.2 * 1.4], b_g=seq.b_g, b_a=seq.b_a,
        dtype=jnp.float32,
    )
    states = jax.jit(
        lambda k: montecarlo.make_fleet(cfg, imu, B, key=k, dtype=jnp.float32),
        out_shardings=batch_sharding,
    )(jax.random.PRNGKey(0))
    frames_dev = jax.device_put(frames, NamedSharding(mesh, P()))

    run = sharding.batched_run_sequence(cfg)
    n_chunks = T // CHUNK

    @jax.jit
    def run_chunk(states, frames_full, start):
        cf = jax.tree_util.tree_map(
            lambda x: jax.lax.dynamic_slice_in_dim(x, start, CHUNK, 0),
            frames_full,
        )
        bf = jax.tree_util.tree_map(
            lambda x: jax.lax.with_sharding_constraint(
                jnp.broadcast_to(x[:, None], (CHUNK, B) + x.shape[1:]),
                NamedSharding(mesh, P(None, sharding.FILTER_AXIS)),
            ),
            cf,
        )
        final, outs = run(states, bf)
        # ALL filters' positions (for fleet-mean ATE), transposed (B, CHUNK, 3)
        return final, jnp.swapaxes(outs.p_I_G, 0, 1), sharding.fleet_metrics(final)

    def run_all(states):
        ps, metrics = [], None
        for c in range(n_chunks):
            states, p, metrics = run_chunk(
                states, frames_dev, jnp.asarray(c * CHUNK, jnp.int32)
            )
            ps.append(p)
            np.asarray(jax.device_get(states.imu.q_IG[:1]))
        return states, ps, metrics

    t0 = time.perf_counter()
    final, ps, metrics = run_all(states)
    compile_first = time.perf_counter() - t0
    times = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        final, ps, metrics = run_all(states)
        times.append(time.perf_counter() - t0)
    dt = min(times)

    est = np.concatenate([np.asarray(p) for p in ps], axis=1)  # (B, T, 3)
    finite_mask = np.isfinite(est).all(axis=(1, 2))
    ates = np.array([
        ate_rmse(est[b], seq.gt_p) for b in range(B) if finite_mask[b]
    ])
    metrics = {k: float(v) for k, v in metrics.items()}
    rec = {
        "cell": name,
        "frame_steps_per_s": round(B * T / dt, 1),
        "compile_first_s": round(compile_first, 1),
        "ate_mean_m": round(float(ates.mean()), 4),
        "ate_p95_m": round(float(np.percentile(ates, 95)), 4),
        "ate_filter0_m": round(float(ate_rmse(est[0], seq.gt_p)), 4),
        "n_finite": int(finite_mask.sum()),
        "row_overflow": metrics["total_row_overflow"],
        "staged_overflow": metrics["total_staged_overflow"],
        "residualized": metrics["total_residualized"],
        "shapes": {
            "max_staged": cfg.shapes.max_staged,
            "max_update_rows": cfg.shapes.max_update_rows,
            "max_tri_prune": cfg.shapes.max_tri_prune,
            "max_staged_prune": cfg.shapes.max_staged_prune,
        },
        "gating_precision": cfg.filter.gating_precision,
    }
    log(json.dumps(rec))
    return rec


def main():
    cells = [
        # item 4: capacity A/B — serving caps vs default vs burst-sized
        ("serving", serving_cfg()),
        ("staged16", serving_cfg(max_staged=16)),
        ("rows384", serving_cfg(max_update_rows=384)),
        ("tri48", serving_cfg(max_tri_prune=48)),
        ("drop_nothing", serving_cfg(max_staged=16, max_update_rows=512,
                                     max_tri_prune=48, max_staged_prune=64)),
        # item 5: gating precision A/B at the serving shapes
        ("gate_highest", serving_cfg(gating_precision="highest")),
    ]
    base_cfg = MsckfConfig()
    seq = synthetic.generate(base_cfg, n_frames=T, seed=0, pixel_noise=0.5)
    frames = synthetic.to_frame_inputs(seq, jnp.float32)

    results = []
    for name, cfg in cells:
        log(f"=== cell {name} ===")
        results.append(run_cell(name, cfg, seq, frames))

    out = {
        "batch": B, "frames": T, "reps": REPS,
        "device": str(jax.devices()[0]),
        "cells": results,
    }
    with open(os.path.join(REPO, "AB_SWEEP.json"), "w") as f:
        json.dump(out, f, indent=1)
    for r in results:
        print(f"{r['cell']:14s} fps={r['frame_steps_per_s']:8.1f} "
              f"ate_mean={r['ate_mean_m']:.4f} p95={r['ate_p95_m']:.4f} "
              f"rowOF={r['row_overflow']:.0f} stagedOF={r['staged_overflow']:.0f}")
    print("wrote AB_SWEEP.json")


if __name__ == "__main__":
    main()
