"""Long-horizon f32 stress run (VERDICT r4 weak #2/#3).

2000 frames (100 s at 20 Hz — EuRoC sequences are ~180 s) at batch >= 256 on
the TPU, in TWO cells:

  * ``serving``  — the bench serving config (fused updates, max_staged=8,
    obs-width caps), the thing that actually ships;
  * ``generous`` — a drop-(almost-)nothing control (max_staged=16, row budget
    384, tri buffer 48, no obs caps): if the serving ATE plateau is
    overflow-induced, this curve separates from it; if the curves track each
    other, the serving caps are vindicated at horizon. (The reference drops
    nothing, msckf.h:336-449.)

Tracks ATE growth, covariance conditioning (trace, symmetry drift,
finiteness, min VALID diagonal — masked to live window slots; the r4 version
min'd over masked slots and always read 0.0), and overflow counters. Writes
LONG_HORIZON.json at the repo root.

Run serially on the TPU:  python tools/long_horizon.py
Env: LH_BATCH, LH_FRAMES, LH_CELLS=serving,generous
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

B = int(os.environ.get("LH_BATCH", 256))
T = int(os.environ.get("LH_FRAMES", 2000))
CHUNK = 50


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def cell_config(name: str) -> MsckfConfig:
    cfg = MsckfConfig()
    cfg = dataclasses.replace(
        cfg,
        filter=dataclasses.replace(cfg.filter, fused_updates=True,
                                   gating_precision="high"),
    )
    if name == "serving":
        # mirrors bench.py's serving shape (incl. the r5 obs-width caps)
        return dataclasses.replace(
            cfg, shapes=dataclasses.replace(
                cfg.shapes, staged_chunk=max(8, 8192 // B), max_staged=8,
                prune_obs_cap=2, marg_obs_cap=22,
                prune_chunk=48 if B <= 1024 else 6))
    if name == "generous":
        return dataclasses.replace(
            cfg, shapes=dataclasses.replace(
                cfg.shapes, staged_chunk=max(4, 4096 // B), max_staged=16,
                max_update_rows=384, max_tri_prune=48,
                prune_obs_cap=0, marg_obs_cap=0))
    raise ValueError(name)


def run_cell(name: str, seq, frames):
    cfg = cell_config(name)
    imu = ground_truth_init(
        p_I_G=[5.0, 0.0, 0.0], q_IG=[1, 0, 0, 0],
        v_I_G=[0.0, 5.0 * 0.35, 0.2 * 1.4], b_g=seq.b_g, b_a=seq.b_a,
        dtype=jnp.float32,
    )

    mesh = sharding.make_mesh()
    from jax.sharding import NamedSharding, PartitionSpec as P

    batch_sharding = NamedSharding(mesh, P(sharding.FILTER_AXIS))
    states = jax.jit(
        lambda k: montecarlo.make_fleet(cfg, imu, B, key=k, dtype=jnp.float32),
        out_shardings=batch_sharding,
    )(jax.random.PRNGKey(0))
    frames_dev = jax.device_put(frames, NamedSharding(mesh, P()))

    run = sharding.batched_run_sequence(cfg)
    n_chunks = T // CHUNK
    N = cfg.shapes.num_slots

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
        P_ = final.P
        diag = jnp.diagonal(P_, axis1=-2, axis2=-1)  # (B, D)
        # VALID diagonal mask: 15 IMU entries + 6 per live window slot
        slot_valid = final.window.valid  # (B, N)
        dmask = jnp.concatenate(
            [jnp.ones((B, 15), bool),
             jnp.repeat(slot_valid, 6, axis=-1)], axis=-1)
        health = {
            "mean_pos_cov_trace": jnp.mean(
                jnp.trace(P_[..., 12:15, 12:15], axis1=-2, axis2=-1)),
            "max_pos_cov_trace": jnp.max(
                jnp.trace(P_[..., 12:15, 12:15], axis1=-2, axis2=-1)),
            "max_sym_drift": jnp.max(jnp.abs(P_ - jnp.swapaxes(P_, -1, -2))),
            "max_abs_P": jnp.max(jnp.abs(P_)),
            "min_valid_diag_P": jnp.min(jnp.where(dmask, diag, jnp.inf)),
            "row_overflow": jnp.sum(final.diag.row_overflow),
            "staged_overflow": jnp.sum(final.diag.staged_overflow),
            "gating_rejects": jnp.sum(final.diag.gating_rejects),
            "updates": jnp.sum(final.diag.updates_applied),
        }
        return final, jnp.swapaxes(outs.p_I_G, 0, 1), health

    curve = []
    ps = []
    t0 = time.perf_counter()
    s = states
    for c in range(n_chunks):
        s, p, health = run_chunk(s, frames_dev, jnp.asarray(c * CHUNK, jnp.int32))
        ps.append(np.asarray(p))
        h = {k: float(v) for k, v in health.items()}
        h["frame"] = (c + 1) * CHUNK
        if (c + 1) % 4 == 0 or c == n_chunks - 1:
            est = np.concatenate(ps, axis=1)  # (B, frames_so_far, 3)
            f_sofar = est.shape[1]
            finite = np.isfinite(est).all(axis=(1, 2))
            ates = np.array([ate_rmse(est[b], seq.gt_p[:f_sofar])
                             for b in range(B) if finite[b]])
            h["ate_mean"] = round(float(ates.mean()), 4) if len(ates) else None
            h["ate_p95"] = (round(float(np.percentile(ates, 95)), 4)
                            if len(ates) else None)
            h["n_finite"] = int(finite.sum())
            log(f"[{name}] frame {h['frame']:5d}: ate_mean={h.get('ate_mean')} "
                f"p95={h.get('ate_p95')} finite={h['n_finite']}/{B} "
                f"covtr={h['mean_pos_cov_trace']:.3f} "
                f"mindiag={h['min_valid_diag_P']:.2e} "
                f"row_ovf={h['row_overflow']:.0f}")
        curve.append(h)
    wall = time.perf_counter() - t0
    log(f"[{name}] wall {wall:.1f}s ({B * T / wall:.0f} frame-steps/s incl. compile)")
    return {"wall_s": round(wall, 1),
            "frame_steps_per_s": round(B * T / wall, 1),
            "final": curve[-1], "curve": curve}


def main():
    cells = os.environ.get("LH_CELLS", "serving,generous").split(",")
    log(f"generating {T}-frame world...")
    cfg0 = MsckfConfig()
    seq = synthetic.generate(cfg0, n_frames=T, seed=0, pixel_noise=0.5)
    frames = synthetic.to_frame_inputs(seq, jnp.float32)

    out = {"batch": B, "frames": T, "device": str(jax.devices()[0]),
           "cells": {}}
    for name in cells:
        out["cells"][name] = run_cell(name.strip(), seq, frames)

    if len(out["cells"]) == 2:
        s = out["cells"]["serving"]["final"]
        g = out["cells"]["generous"]["final"]
        if s.get("ate_mean") and g.get("ate_mean"):
            out["serving_vs_generous_ate_mean_delta_m"] = round(
                s["ate_mean"] - g["ate_mean"], 4)
    with open(os.path.join(REPO, "LONG_HORIZON.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v for k, v in out.items() if k != "cells"}
                     | {n: c["final"] for n, c in out["cells"].items()},
                     indent=1, default=str))


if __name__ == "__main__":
    main()
