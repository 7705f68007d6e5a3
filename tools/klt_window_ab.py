"""KLT serving-window A/B on the static-texture world (VERDICT r4 item 3).

Round 4 chose serving window 21 on a world whose background noise was
redrawn every frame — an artifact that penalizes exactly the larger windows
the reference uses (51/5, corner_detector.cpp:206). data/render.py now
defaults to a world-anchored static texture; this sweep re-measures the
end-to-end image-bench ATE and throughput per window there and writes
KLT_WINDOW_AB.json. The shipped window is decided from THIS data.

Run serially on the TPU:  python tools/klt_window_ab.py
Env: AB_BATCH (256), AB_FRAMES (200), AB_CELLS="21:4,31:5,51:5"
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    batch = os.environ.get("AB_BATCH", "256")
    frames = os.environ.get("AB_FRAMES", "200")
    cells_spec = os.environ.get("AB_CELLS", "21:4,31:5,51:5")
    cells = []
    for spec in cells_spec.split(","):
        win, lev = spec.split(":")
        env = dict(os.environ, MSCKF_KLT_WINDOW=win, MSCKF_KLT_LEVELS=lev)
        log(f"cell window={win} levels={lev} ...")
        t0 = time.perf_counter()
        proc = subprocess.run(
            [sys.executable, "-u", os.path.join(REPO, "bench.py"), "--images",
             "--batch", batch, "--frames", frames, "--reps", "2"],
            stdout=subprocess.PIPE, env=env, cwd=REPO, timeout=3000,
        )
        out = proc.stdout.decode().strip().splitlines()
        rec = json.loads(out[-1]) if (proc.returncode == 0 and out) else {}
        cells.append({
            "window": int(win), "levels_requested": int(lev),
            "ate_filter0_m": rec.get("diagnostics", {}).get("ate_m"),
            "img_frame_steps_per_s": rec.get("value"),
            "unit": rec.get("unit"),
        })
        log(f"  -> {cells[-1]['img_frame_steps_per_s']} img-fs/s, "
            f"ATE {cells[-1]['ate_filter0_m']} m "
            f"({time.perf_counter()-t0:.0f}s)")

    out = {
        "config": (f"image bench, batch {batch} x {frames} frames, TPU, "
                   "shared-camera STATIC-TEXTURE world (data/render.py "
                   "world-anchored background; the r4 sweep ran on per-frame "
                   "redrawn noise, which penalized large windows)"),
        "cells": cells,
    }
    with open(os.path.join(REPO, "KLT_WINDOW_AB.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
