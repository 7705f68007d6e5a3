"""Per-stage timing telemetry.

The device-side replacement for the reference's TSTART/TEND/TRECORD wall-clock
macros and the ``StageTiming`` ROS message (/root/reference/datasets/
asl_msckf.cpp:207-296, msg/StageTiming.msg).

Measurement method: each stage is iterated ``reps`` times INSIDE one jitted
``lax.scan`` (the stage output feeds the next iteration's input) and the per-
iteration time is the scan wall time divided by reps. Host-side per-call
timing is useless on a tunneled TPU: every dispatch pays ~0.7 s of RPC
latency and ``block_until_ready`` can return before execution completes, so
the round-2 tables measured mostly dispatch floor. A trailing tiny
``device_get`` provides the real synchronization point.
"""

from __future__ import annotations

import time

import jax
import numpy as np

from msckf_mono_tpu.core import augment, prune, tracks, update
from msckf_mono_tpu.core import filter as msckf_filter
from msckf_mono_tpu.utils.config import MsckfConfig


STAGES = (
    "imu_prop",
    "augment_state",
    "update",
    "add_features",
    "marginalize",
    "prune_redundant",
    "prune_empty_states",
    "full_step",
)


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(leaf.ravel()[:1]))


def stage_timing(state, frame, staged, config: MsckfConfig, reps: int = 10,
                 cost: bool = False):
    """Times each stage on the current device. Returns {stage: seconds}, or
    {stage: (seconds, flops, bytes_accessed)} with ``cost=True`` (XLA's
    compiled cost analysis, divided by the in-scan rep count — the numerator
    of an MFU/roofline estimate; VERDICT r4 item 2).

    ``state``/``frame`` may carry a batch axis (stages are vmapped then).
    The reported time is per-iteration device time (in-scan repetition).
    """
    batched = state.P.ndim == 3
    reps = max(reps, 4)

    def wrap(fn):
        inner = jax.vmap(fn) if batched else fn

        def looped(s, *rest):
            def body(c, _):
                return inner(c, *rest), ()

            out, _ = jax.lax.scan(body, s, None, length=reps)
            return out

        return jax.jit(looped)

    fns = {
        "imu_prop": (lambda s, f: msckf_filter.propagate_block(s, f, config), (frame,)),
        "augment_state": (lambda s, f: augment.augment_state(s, f.state_id, f.time, config), (frame,)),
        "update": (lambda s, f: tracks.update_tracks(s, f.tracked_uv, f.tracked_ids, f.tracked_valid, config)[0], (frame,)),
        "add_features": (lambda s, f: tracks.add_features(s, f.new_uv, f.new_ids, f.new_valid, config), (frame,)),
        "marginalize": (lambda s, st: update.marginalize(s, st, config), (staged,)),
        "prune_redundant": (lambda s: prune.prune_redundant_states(s, config), ()),
        "prune_empty_states": (lambda s: prune.prune_empty_states(s, config), ()),
        "full_step": (lambda s, f: msckf_filter.step(s, f, config)[0], (frame,)),
    }

    out = {}
    for name in STAGES:
        fn, rest = fns[name]
        jfn = wrap(fn)
        res = jfn(state, *rest)  # compile + first run
        _sync(res)
        t0 = time.perf_counter()
        res = jfn(state, *rest)
        _sync(res)
        dt = (time.perf_counter() - t0) / reps
        if cost:
            flops = bytes_ac = float("nan")
            try:
                ca = jfn.lower(state, *rest).compile().cost_analysis()
                if isinstance(ca, (list, tuple)):
                    ca = ca[0]
                # XLA cost analysis counts a while/scan BODY once, not
                # per trip (verified on this jax) — so the reps-scan here
                # already reports exactly ONE stage iteration's flops.
                # Caveat: any scan INSIDE a stage is also counted once;
                # the serving config runs both gated_row_stack sweeps in
                # one chunk (staged_chunk >= max_staged, prune_chunk =
                # max_staged_prune), so the serving numbers are exact.
                flops = float(ca.get("flops", float("nan")))
                bytes_ac = float(ca.get("bytes accessed", float("nan")))
            except Exception:
                pass
            out[name] = (dt, flops, bytes_ac)
        else:
            out[name] = dt
    return out
