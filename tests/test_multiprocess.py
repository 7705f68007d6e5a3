"""Two-process jax.distributed topology test (BASELINE config 5 proxy).

Real multi-host hardware is unavailable here; tools/run_two_host_sim.py runs
the runnable correctness proxy — 2 OS processes x 4 virtual CPU devices
joined by ``jax.distributed.initialize`` into one global 8-device mesh (the
DCN process/addressability shape) — and asserts that the sharded fleet's
metrics and trajectory checksum match a single-process reference and agree
between the two processes. This test just drives the launcher.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_two_process_fleet_matches_single_process():
    proc = subprocess.run(
        [sys.executable, "-u", os.path.join(REPO, "tools", "run_two_host_sim.py")],
        stdout=subprocess.PIPE,
        stderr=subprocess.PIPE,
        timeout=880,
        cwd=REPO,
        # The launcher manages its own XLA_FLAGS / platform per subprocess.
        env={k: v for k, v in os.environ.items() if k not in ("XLA_FLAGS", "JAX_PLATFORMS")},
    )
    assert proc.returncode == 0, proc.stderr.decode()[-3000:]
    last = proc.stdout.decode().strip().splitlines()[-1]
    rec = json.loads(last)
    assert rec["ok"] is True
    assert rec["metrics"]["total_residualized"] > 0
