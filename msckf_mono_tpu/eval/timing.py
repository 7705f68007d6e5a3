"""Per-stage timing telemetry.

The device-side replacement for the reference's TSTART/TEND/TRECORD wall-clock
macros and the ``StageTiming`` ROS message (/root/reference/datasets/
asl_msckf.cpp:207-296, msg/StageTiming.msg): each pipeline stage is jitted
separately and timed with ``block_until_ready`` over repeated runs, yielding
the same per-stage breakdown the reference publishes per frame.
"""

from __future__ import annotations

import time

import jax

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


def _block(x):
    jax.tree_util.tree_map(
        lambda a: a.block_until_ready() if hasattr(a, "block_until_ready") else a, x
    )


def stage_timing(state, frame, staged, config: MsckfConfig, reps: int = 10):
    """Times each stage on the current device. Returns {stage: seconds}.

    ``state``/``frame`` may carry a batch axis (stages are vmapped then).
    """
    batched = state.P.ndim == 3

    def wrap(fn):
        if batched:
            fn = jax.vmap(fn)
        return jax.jit(fn)

    fns = {
        "imu_prop": (wrap(lambda s, f: msckf_filter.propagate_block(s, f, config)), (state, frame)),
        "augment_state": (wrap(lambda s, f: augment.augment_state(s, f.state_id, f.time, config)), (state, frame)),
        "update": (wrap(lambda s, f: tracks.update_tracks(s, f.tracked_uv, f.tracked_ids, f.tracked_valid, config)), (state, frame)),
        "add_features": (wrap(lambda s, f: tracks.add_features(s, f.new_uv, f.new_ids, f.new_valid, config)), (state, frame)),
        "marginalize": (wrap(lambda s, st: update.marginalize(s, st, config)), (state, staged)),
        "prune_redundant": (wrap(lambda s: prune.prune_redundant_states(s, config)), (state,)),
        "prune_empty_states": (wrap(lambda s: prune.prune_empty_states(s, config)), (state,)),
        "full_step": (wrap(lambda s, f: msckf_filter.step(s, f, config)), (state, frame)),
    }

    out = {}
    for name, (fn, args) in fns.items():
        _block(fn(*args))  # compile
        t0 = time.perf_counter()
        for _ in range(reps):
            _block(fn(*args))
        out[name] = (time.perf_counter() - t0) / reps
    return out
