"""Long-horizon f32 stress run (VERDICT r4 item 7).

2000 frames (100 s at 20 Hz — EuRoC sequences are ~180 s) at batch >= 256 on
the TPU serving config: tracks ATE growth, covariance conditioning (trace,
symmetry drift, finiteness), and overflow counters along the horizon. The
round-3 evidence topped out at 200 frames; the reference runs whole sequences
(asl_msckf.cpp:206-478). Writes LONG_HORIZON.json at the repo root.

Run serially on the TPU:  python tools/long_horizon.py
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


def main():
    cfg = MsckfConfig()
    cfg = dataclasses.replace(
        cfg,
        filter=dataclasses.replace(cfg.filter, fused_updates=True,
                                   gating_precision="high"),
        shapes=dataclasses.replace(cfg.shapes,
                                   staged_chunk=max(8, 8192 // B),
                                   max_staged=8),
    )
    log(f"generating {T}-frame world...")
    seq = synthetic.generate(cfg, n_frames=T, seed=0, pixel_noise=0.5)
    frames = synthetic.to_frame_inputs(seq, jnp.float32)

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
        health = {
            "mean_pos_cov_trace": jnp.mean(
                jnp.trace(P_[..., 12:15, 12:15], axis1=-2, axis2=-1)),
            "max_pos_cov_trace": jnp.max(
                jnp.trace(P_[..., 12:15, 12:15], axis1=-2, axis2=-1)),
            "max_sym_drift": jnp.max(jnp.abs(P_ - jnp.swapaxes(P_, -1, -2))),
            "max_abs_P": jnp.max(jnp.abs(P_)),
            "min_diag_P": jnp.min(jnp.diagonal(P_, axis1=-2, axis2=-1)),
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
        # windowed ATE so far for filter 0 + fleet mean every few chunks
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
            log(f"frame {h['frame']:5d}: ate_mean={h.get('ate_mean')} "
                f"p95={h.get('ate_p95')} finite={h['n_finite']}/{B} "
                f"covtr={h['mean_pos_cov_trace']:.3f} sym={h['max_sym_drift']:.2e}")
        curve.append(h)
    wall = time.perf_counter() - t0

    out = {
        "batch": B, "frames": T, "wall_s": round(wall, 1),
        "frame_steps_per_s": round(B * T / wall, 1),
        "device": str(jax.devices()[0]),
        "final": curve[-1],
        "curve": curve,
    }
    with open(os.path.join(REPO, "LONG_HORIZON.json"), "w") as f:
        json.dump(out, f, indent=1)
    log(f"wall {wall:.1f}s  ({B * T / wall:.0f} frame-steps/s incl. compile)")
    print(json.dumps({k: out[k] for k in ("batch", "frames", "final")}, indent=1))


if __name__ == "__main__":
    main()
