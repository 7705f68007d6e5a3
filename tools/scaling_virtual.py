"""Emit SCALING_VIRTUAL.json: filters/s across virtual CPU mesh sizes.

Separated from tests/test_sharding.py::test_scaling_efficiency_curve (which
asserts the MECHANISM only) so that running the test suite never mutates the
committed artifact with machine-dependent timings (ADVICE r3).

Usage:  python tools/scaling_virtual.py  (forces 8 virtual CPU devices)
"""

import json
import os
import sys
import time

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp

from msckf_mono_tpu.core.init import ground_truth_init
from msckf_mono_tpu.data import synthetic
from msckf_mono_tpu.parallel import montecarlo, sharding
from msckf_mono_tpu.utils.config import MsckfConfig

BATCH = 16
FRAMES = 40


def main() -> None:
    cfg = MsckfConfig()
    seq = synthetic.generate(cfg, n_frames=FRAMES, seed=0, pixel_noise=0.5)
    frames = synthetic.to_frame_inputs(seq, jnp.float32)
    imu = ground_truth_init(
        p_I_G=[5.0, 0.0, 0.0], q_IG=[1, 0, 0, 0],
        v_I_G=[0.0, 5.0 * 0.35, 0.28], b_g=seq.b_g, b_a=seq.b_a,
        dtype=jnp.float32,
    )
    states = montecarlo.make_fleet(cfg, imu, BATCH, dtype=jnp.float32)
    bframes = montecarlo.broadcast_frames(frames, BATCH)

    results = {}
    for n in (1, 2, 4, 8):
        mesh = Mesh(np.asarray(jax.devices()[:n]), (sharding.FILTER_AXIS,))
        run = sharding.make_sharded_run(cfg, mesh)
        s = jax.device_put(states, NamedSharding(mesh, P(sharding.FILTER_AXIS)))
        final, outs, metrics = run(s, bframes)
        jax.block_until_ready(final)
        t0 = time.perf_counter()
        final, outs, metrics = run(s, bframes)
        jax.block_until_ready(final)
        results[n] = BATCH * FRAMES / (time.perf_counter() - t0)
        assert np.isfinite(float(metrics["mean_pos_cov_trace"]))

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rec = {
        "filters_per_s_by_mesh_size": {str(k): round(v, 1) for k, v in results.items()},
        "relative_to_1dev": {
            str(k): round(v / results[1], 3) for k, v in results.items()
        },
        "caveat": (
            "8 virtual CPU devices share one host's cores, so wall-clock "
            "does not improve with mesh size here; this records the "
            "MECHANISM (sharded compile+run+collectives at every size). "
            "Real >=80% ICI scaling needs multi-chip hardware, which this "
            "environment does not provide (BASELINE config 5 proxy: "
            "tests/test_multiprocess.py)."
        ),
    }
    out = os.path.join(repo, "SCALING_VIRTUAL.json")
    with open(out, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps(rec["filters_per_s_by_mesh_size"]))
    print("wrote", out)


if __name__ == "__main__":
    main()
