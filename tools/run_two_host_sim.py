#!/usr/bin/env python
"""Two-process jax.distributed simulation of the DCN-shaped topology.

BASELINE config 5 calls for N>=2 HOSTS. Real multi-host TPU hardware is not
available in this environment, so this tool runs the correctness proxy that
is runnable: 2 OS processes x 4 virtual CPU devices each, joined through
``jax.distributed.initialize`` into one 8-device global mesh — the same
process/addressability topology as 2 TPU hosts on DCN (each process sees only
its local devices; global arrays + collectives span both).

Checks (driven by tests/test_multiprocess.py):
* the sharded fleet runs under jit across both processes,
* fleet metrics (psum-lowered reductions) agree between processes,
* trajectory + metric values match a single-process reference run.

Usage:  python tools/run_two_host_sim.py            # launcher
        python tools/run_two_host_sim.py --worker I # internal
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

BATCH = 16
FRAMES = 8
PORT = 12961

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_case():
    import jax.numpy as jnp

    from msckf_mono_tpu.core.init import ground_truth_init
    from msckf_mono_tpu.data import synthetic
    from msckf_mono_tpu.parallel import montecarlo
    from msckf_mono_tpu.utils.config import MsckfConfig

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
    return cfg, states, bframes


def result_dict(final, outs, metrics):
    import jax
    import numpy as np

    out = {k: float(np.asarray(jax.device_get(v))) for k, v in metrics.items()}
    return out


def run_worker(process_id: int):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"localhost:{PORT}",
        num_processes=2,
        process_id=process_id,
    )
    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from msckf_mono_tpu.parallel import sharding

    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 8, jax.device_count()
    assert len(jax.local_devices()) == 4

    cfg, states, bframes = build_case()
    mesh = sharding.make_mesh()  # all 8 global devices

    def put(tree, spec):
        sh = NamedSharding(mesh, spec)

        def one(x):
            x = np.asarray(x)
            return jax.make_array_from_callback(x.shape, sh, lambda idx: x[idx])

        return jax.tree_util.tree_map(one, tree)

    states = put(states, P(sharding.FILTER_AXIS))
    bframes = put(bframes, P(None, sharding.FILTER_AXIS))

    fleet_run = sharding.make_sharded_run(cfg, mesh)
    final, outs, metrics = fleet_run(states, bframes)

    # Global trajectory checksum: reduces over the sharded batch axis inside
    # jit, so the result is replicated and addressable on every process.
    ss = jax.jit(
        lambda o: jnp.sum(o.p_I_G * o.p_I_G) + jnp.sum(jnp.abs(o.q_IG)),
        out_shardings=NamedSharding(mesh, P()),
    )(outs)
    rec = result_dict(final, outs, metrics)
    rec["traj_ss"] = float(np.asarray(jax.device_get(ss)))
    rec["process_id"] = process_id
    print("RESULT " + json.dumps(rec, sort_keys=True), flush=True)


def run_reference():
    """Single-process 8-device reference values."""
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    import jax.numpy as jnp

    from msckf_mono_tpu.parallel import sharding

    cfg, states, bframes = build_case()
    mesh = sharding.make_mesh()
    states = sharding.shard_batch(states, mesh)
    fleet_run = sharding.make_sharded_run(cfg, mesh)
    final, outs, metrics = fleet_run(states, bframes)
    rec = result_dict(final, outs, metrics)
    rec["traj_ss"] = float(
        np.asarray(jnp.sum(outs.p_I_G * outs.p_I_G) + jnp.sum(jnp.abs(outs.q_IG)))
    )
    print("RESULT " + json.dumps(rec, sort_keys=True), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", type=int, default=None)
    ap.add_argument("--reference", action="store_true")
    args = ap.parse_args()
    if args.reference:
        return run_reference()
    if args.worker is not None:
        return run_worker(args.worker)

    # Launcher: reference + 2 workers.
    me = os.path.abspath(__file__)
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    ref = subprocess.run(
        [sys.executable, "-u", me, "--reference"], stdout=subprocess.PIPE,
        stderr=subprocess.PIPE, timeout=900, env=env,
    )
    assert ref.returncode == 0, ref.stderr.decode()[-2000:]

    procs = [
        subprocess.Popen(
            [sys.executable, "-u", me, "--worker", str(i)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=dict(env),
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        so, se = p.communicate(timeout=900)
        assert p.returncode == 0, se.decode()[-2000:]
        outs.append(so)

    def parse(raw):
        for line in raw.decode().splitlines():
            if line.startswith("RESULT "):
                return json.loads(line[len("RESULT "):])
        raise AssertionError("no RESULT line in: " + raw.decode()[-500:])

    ref_rec = parse(ref.stdout)
    w0, w1 = (parse(o) for o in outs)
    for k in ref_rec:
        if k == "process_id":
            continue
        a, b, c = ref_rec[k], w0[k], w1[k]
        assert abs(b - c) <= 1e-6 * max(1.0, abs(b)), (k, b, c)
        assert abs(a - b) <= 1e-4 * max(1.0, abs(a)) + 1e-6, (k, a, b)
    print(json.dumps({"ok": True, "metrics": ref_rec}))


if __name__ == "__main__":
    main()
