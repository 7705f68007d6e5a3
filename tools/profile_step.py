#!/usr/bin/env python
"""Capture a device trace of the batched frame step and print per-op times.

Runs the full vmapped ``filter.step`` (or a sub-stage via --stage) under
``jax.profiler.trace`` and parses the resulting xplane protobuf with xprof's
converters, printing the top HLO ops by self time — the ground truth for
"where does the frame step's time actually go" that round-2's black-box
stage timers could not provide (the tunneled TPU's ~0.7 s dispatch latency
and async-transfer quirks swamp host-side timing).

Usage:
  python tools/profile_step.py [--batch 256] [--iters 5] [--out /tmp/trace]
"""

from __future__ import annotations

import argparse
import glob
import json
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
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--out", default="/tmp/step_trace")
    ap.add_argument("--platform", default=None)
    ap.add_argument("--state", default="/tmp/warm_state_b8.npz",
                    help="state snapshot from tools/save_warm_state (optional)")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--fused", action=argparse.BooleanOptionalAction, default=True,
                    help="profile the serving config (fused_updates=True)")
    args = ap.parse_args()

    import pickle

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import dataclasses

    import jax.numpy as jnp

    from msckf_mono_tpu.core import filter as mf
    from msckf_mono_tpu.utils.config import MsckfConfig

    cfg = MsckfConfig()
    if args.fused:
        # Mirror bench.py's serving configuration exactly (fused update,
        # cheap gating tier, bench staging caps) so the profile answers
        # "where does the BENCH step's time go".
        cfg = dataclasses.replace(
            cfg,
            filter=dataclasses.replace(cfg.filter, fused_updates=True,
                                       gating_precision="high"),
            shapes=dataclasses.replace(
                cfg.shapes, max_staged=8,
                staged_chunk=max(2, 8192 // max(args.batch, 1))),
        )
    B = args.batch

    # Load the saved warm state + frame and broadcast to the batch; if the
    # snapshot is missing or its treedef predates the current FilterState
    # (e.g. new fields), regenerate inline by running the real pipeline.
    state = frame = None
    try:
        tdp = args.state.replace("_b8.npz", "_treedef.pkl")
        with open(tdp, "rb") as f:
            td = pickle.load(f)
        z = np.load(args.state)
        leaves = [
            jnp.asarray(np.broadcast_to(z[k][0:1], (B,) + z[k].shape[1:]).copy())
            for k in z.files
        ]
        state = jax.tree_util.tree_unflatten(td, leaves)
        fz = np.load(args.state.replace("state", "frame"))
        with open(args.state.replace("state_b8.npz", "frame_treedef.pkl"), "rb") as f:
            ftd = pickle.load(f)
        fleaves = [
            jnp.asarray(np.broadcast_to(fz[k][0:1], (B,) + fz[k].shape[1:]).copy())
            for k in fz.files
        ]
        frame = jax.tree_util.tree_unflatten(ftd, fleaves)
        log(f"state loaded, batch={B}")
    except Exception as e:  # noqa: BLE001
        log(f"snapshot unusable ({type(e).__name__}: {e}); regenerating warm state")
        from msckf_mono_tpu.core.init import ground_truth_init
        from msckf_mono_tpu.core.types import init_filter_state
        from msckf_mono_tpu.data import synthetic

        T_warm = 30
        seq = synthetic.generate(cfg, n_frames=T_warm + 1, seed=0, pixel_noise=0.5)
        frames_all = synthetic.to_frame_inputs(seq, jnp.float32)
        imu = ground_truth_init(
            p_I_G=[5.0, 0.0, 0.0], q_IG=[1, 0, 0, 0],
            v_I_G=[0.0, 5.0 * 0.35, 0.28], b_g=seq.b_g, b_a=seq.b_a,
            dtype=jnp.float32,
        )

        @jax.jit
        def gen():
            s0 = init_filter_state(cfg, imu, dtype=jnp.float32)
            warm = jax.tree_util.tree_map(lambda x: x[:T_warm], frames_all)
            s, _ = mf.run_sequence(s0, warm, cfg)
            last = jax.tree_util.tree_map(lambda x: x[T_warm], frames_all)
            bs = jax.tree_util.tree_map(
                lambda x: jnp.broadcast_to(x, (B,) + x.shape), s)
            bf = jax.tree_util.tree_map(
                lambda x: jnp.broadcast_to(x, (B,) + x.shape), last)
            return bs, bf

        state, frame = gen()
        jax.block_until_ready(state.P)
        np.asarray(jax.device_get(state.imu.q_IG[:1]))
        log(f"warm state generated, batch={B}")

    def run(s, f):
        def body(c, _):
            return jax.vmap(lambda ss, ff: mf.step(ss, ff, cfg)[0])(c, f), ()

        out, _ = jax.lax.scan(body, s, None, length=args.iters)
        return out

    j = jax.jit(run)
    t0 = time.perf_counter()
    out = j(state, frame)
    np.asarray(jax.device_get(out.imu.q_IG[:1]))
    log(f"compile+first: {time.perf_counter() - t0:.1f}s")

    t0 = time.perf_counter()
    out = j(state, frame)
    np.asarray(jax.device_get(out.imu.q_IG[:1]))
    per = (time.perf_counter() - t0) / args.iters
    log(f"steady state: {per*1e3:.1f} ms/step")

    from msckf_mono_tpu.eval import profile as mprofile

    os.makedirs(args.out, exist_ok=True)
    with mprofile.trace(args.out):
        out = j(state, frame)
        np.asarray(jax.device_get(out.imu.q_IG[:1]))

    # ---- parse the xplane with xprof ----
    paths = sorted(
        glob.glob(os.path.join(args.out, "**", "*.xplane.pb"), recursive=True),
        key=os.path.getmtime,
    )
    if not paths:
        log("no xplane written!")
        return
    xplane = paths[-1]
    log(f"parsing {xplane}")

    import collections
    import re

    from xprof.convert import raw_to_tool_data

    data, _ = raw_to_tool_data.xspace_to_tool_data([xplane], "hlo_stats", {})
    if isinstance(data, bytes):
        data = data.decode()
    rec = json.loads(data)

    def val(r, i):
        c = r["c"][i]
        return c.get("v") if isinstance(c, dict) else c

    tot = 0.0
    by_src = collections.Counter()
    by_cat = collections.Counter()
    for r in rec["rows"]:
        cat, name = val(r, 2), val(r, 3)
        self_us = val(r, 9) or 0.0
        src = val(r, 25) or ""
        m = re.search(r">([^<]+)</div>", src)
        s = m.group(1) if m else name.split(".")[0]
        tot += self_us
        by_src[s] += self_us
        by_cat[cat] += self_us

    log(f"\ntotal device self time: {tot/1e3:.1f} ms over {args.iters} steps "
        f"({tot/1e3/args.iters:.1f} ms/step)")
    log("== by category ==")
    for k, v in by_cat.most_common(12):
        log(f"  {k:38s} {v/1e3:9.1f} ms  {100*v/tot:5.1f}%")
    log("== by source line ==")
    for k, v in by_src.most_common(args.top):
        log(f"  {k:60s} {v/1e3:9.1f} ms  {100*v/tot:5.1f}%")

    with open(os.path.join(args.out, "hlo_stats.json"), "w") as f:
        json.dump(rec, f)
    log(f"saved {args.out}/hlo_stats.json")


if __name__ == "__main__":
    main()
