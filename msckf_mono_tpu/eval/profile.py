"""Device profiling helpers.

The TPU-native replacement for the reference's perf-record launch mode
(/root/reference/launch/asl_msckf.launch:48: ``perf record -g --call-graph
dwarf``): captures an XLA/TPU profiler trace viewable in TensorBoard or
Perfetto, plus a lightweight stage-level wall-clock context manager that
mirrors the TSTART/TEND macros (datasets/asl_msckf.cpp:207-212).
"""

from __future__ import annotations

import contextlib
import time


@contextlib.contextmanager
def trace(logdir: str = "/tmp/msckf_tpu_trace"):
    """Capture a JAX profiler trace around the enclosed device work.

    View with: tensorboard --logdir <logdir>  (or upload the .trace.json.gz
    under plugins/profile/ to ui.perfetto.dev).
    """
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


class StageTimer:
    """Accumulating per-stage wall timer (the StageTiming msg analogue).

    >>> st = StageTimer()
    >>> with st.stage("imu_prop"): ...
    >>> st.summary()   # {stage: {"total_s":..., "calls":..., "mean_ms":...}}
    """

    def __init__(self):
        self.totals: dict[str, float] = {}
        self.calls: dict[str, int] = {}

    @contextlib.contextmanager
    def stage(self, name: str, block=None):
        """Times the block; pass ``block`` (an array/pytree) to include device
        completion via block_until_ready."""
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if block is not None:
                import jax

                jax.block_until_ready(block)
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.calls[name] = self.calls.get(name, 0) + 1

    def summary(self) -> dict:
        return {
            k: {
                "total_s": round(v, 4),
                "calls": self.calls[k],
                "mean_ms": round(1e3 * v / max(self.calls[k], 1), 3),
            }
            for k, v in sorted(self.totals.items(), key=lambda kv: -kv[1])
        }
