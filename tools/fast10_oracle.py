"""Exact FAST-10 oracle: published-definition segment test + libfast-style
binary-search score, independently implemented, diffed against our detector.

The reference detector is libfast's ``fast_corner_detect_10`` +
``fast_corner_score_10`` + ``fast_nonmax_3x3``
(/root/reference/src/corner_detector.cpp:91-103, linked from uzh-rpg/fast,
CMakeLists.txt:25-26). The libfast SOURCE is not reachable from this
environment (zero egress; not vendored in /root/reference), so the oracle
re-implements the *published algorithm definition* (Rosten & Drummond,
"Machine learning for high-speed corner detection", ECCV 2006) with a
deliberately DIFFERENT formulation from our production code:

  * production (frontend/detect.py, ops/fast_pallas.py): closed-form score =
    max over the 16 length-10 arcs of min over the arc of the signed
    difference; corner iff score > threshold.
  * oracle (here): per-pixel boolean segment test — exists a contiguous
    circular run of >= 10 of the 16 Bresenham-circle pixels all brighter
    than p + b (or all darker than p - b) — via doubled-sequence run-length
    scan, plus the libfast score semantics: the LARGEST integer b for which
    the segment test still passes, found by per-pixel integer binary search
    that only ever invokes the boolean test (exactly how libfast's
    fast_corner_score_10 computes it).

Agreement between the two formulations is a real check: they share no code
and no algebra beyond the algorithm's definition. On integer images the
oracle score must equal (our closed-form score - 1) exactly: our score s is
the supremum difference, and the largest integer b with "all diffs > b" is
s - 1.

Writes FAST10_ORACLE.json at the repo root.

Usage: python tools/fast10_oracle.py [--pallas]   (--pallas additionally
checks the TPU kernel; needs a TPU or interpret mode)
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from msckf_mono_tpu.frontend.detect import FAST_OFFSETS  # noqa: E402

THRESHOLD = 20  # the reference's hardwired b (corner_detector.cpp:94)


def _circle_values(img):
    """(16, H, W) circle-pixel values (roll; 3px border garbage, masked later)."""
    return np.stack(
        [np.roll(img, (-dy, -dx), (0, 1)) for dx, dy in FAST_OFFSETS], axis=0
    )


def segment_test(img, b):
    """Boolean FAST-10 segment test at threshold ``b`` (scalar or (H, W))."""
    circ = _circle_values(img)
    center = img[None]
    bright = circ > center + b
    dark = circ < center - b

    def has_run_10(flags):
        run = np.zeros(img.shape, np.int32)
        best = np.zeros(img.shape, np.int32)
        for i in range(32):  # doubled sequence handles circular wrap
            run = np.where(flags[i % 16], run + 1, 0)
            best = np.maximum(best, run)
        return best >= 10

    H, W = img.shape
    yy, xx = np.mgrid[0:H, 0:W]
    interior = (yy >= 3) & (yy < H - 3) & (xx >= 3) & (xx < W - 3)
    return (has_run_10(bright) | has_run_10(dark)) & interior


def oracle_score(img, b0=THRESHOLD):
    """libfast ``fast_corner_score_10`` semantics: for pixels passing the
    test at ``b0``, the largest integer b at which it still passes (per-pixel
    integer binary search over [b0, 255] invoking only the boolean test)."""
    corner = segment_test(img, b0)
    lo = np.where(corner, b0, -1).astype(np.int64)
    hi = np.full(img.shape, 255, np.int64)
    while True:
        active = corner & (hi > lo)
        if not active.any():
            break
        mid = (lo + hi + 1) // 2
        ok = segment_test(img, mid.astype(img.dtype))
        lo = np.where(active & ok, mid, lo)
        hi = np.where(active & ~ok, mid - 1, hi)
    return corner, lo


def nonmax_3x3(score, mask, tie="keep"):
    """3x3 NMS on the score. ``tie="keep"``: survive when >= all neighbors
    (our production rule); ``tie="drop"``: survive only when > all neighbors.
    Returns (survivors, n_ties) — ties are the only pixels where the two
    rules can disagree."""
    s = np.where(mask, score.astype(np.float64), -np.inf)
    neigh = np.full_like(s, -np.inf)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dx == 0 and dy == 0:
                continue
            neigh = np.maximum(neigh, np.roll(s, (dy, dx), (0, 1)))
    ties = mask & (s == neigh)
    keep = mask & (s >= neigh if tie == "keep" else s > neigh)
    return keep, int(ties.sum())


def our_detector(img, use_pallas=False, threshold=float(THRESHOLD)):
    """Production path: closed-form score + NMS (jnp or the Pallas kernel)."""
    import jax.numpy as jnp

    from msckf_mono_tpu.frontend import detect

    if use_pallas:
        from msckf_mono_tpu.ops import fast_pallas
        import jax

        interp = jax.default_backend() != "tpu"
        nms = np.asarray(
            fast_pallas.fast_nms_score(jnp.asarray(img, jnp.float32), threshold,
                                       interpret=interp)
        )
        return nms > 0, nms
    mask, score = detect.fast_score_10(jnp.asarray(img, jnp.float64), threshold)
    nms = detect.nonmax_3x3(score, mask)
    return np.asarray(nms), np.asarray(jnp.where(mask, score, 0.0))


def compare_one(img, name, use_pallas=False):
    """All FAST comparisons for one image; img must be integer-valued."""
    corner, score = oracle_score(img)
    nms_keep, n_ties = nonmax_3x3(score, corner, tie="keep")

    ours_nms, ours_score = our_detector(img, use_pallas=use_pallas)
    # our closed-form corner mask (pre-NMS) for the detect comparison
    import jax.numpy as jnp
    from msckf_mono_tpu.frontend import detect

    our_mask, our_raw = detect.fast_score_10(jnp.asarray(img, jnp.float64),
                                             float(THRESHOLD))
    our_mask = np.asarray(our_mask)
    our_raw = np.asarray(our_raw)

    det_eq = bool((our_mask == corner).all())
    # integer images: oracle score == our closed-form score - 1 on corners
    score_eq = bool(
        np.array_equal(score[corner], (our_raw[corner] - 1).astype(np.int64))
    )
    nms_eq = bool((ours_nms == nms_keep).all())
    return dict(
        image=name,
        n_corners=int(corner.sum()),
        detect_sets_equal=det_eq,
        scores_exact=score_eq,
        nms_sets_equal=nms_eq,
        nms_score_ties=n_ties,
        n_after_nms=int(nms_keep.sum()),
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pallas", action="store_true",
                    help="compare the Pallas kernel instead of the jnp path")
    args = ap.parse_args()

    from msckf_mono_tpu.data import render, synthetic
    from msckf_mono_tpu.utils.config import MsckfConfig

    cfg = MsckfConfig()
    seq, world = synthetic.generate(cfg, n_frames=6, seed=0, pixel_noise=0.0,
                                    n_landmarks=500, return_world=True)
    results = []
    # (a) rendered static-world frames quantized to uint8 (the reference's
    #     input domain is 8-bit camera images)
    for f in (0, 3):
        img = np.clip(render.render_frame(cfg, world, f), 0, 255).astype(np.uint8)
        results.append(compare_one(img.astype(np.int64), f"rendered_u8_f{f}",
                                   use_pallas=args.pallas))
    # (b) pure random uint8 — the adversarial tie-heavy case
    rng = np.random.default_rng(42)
    results.append(compare_one(
        rng.integers(0, 256, (240, 320)).astype(np.int64), "random_u8",
        use_pallas=args.pallas))
    # (c) high-contrast random blocks (many strong corners)
    blocks = np.kron(rng.integers(0, 256, (30, 40)), np.ones((8, 8), np.int64))
    results.append(compare_one(blocks, "blocks_u8", use_pallas=args.pallas))

    out = {
        "threshold": THRESHOLD,
        "oracle": "independent segment-test + integer-binary-search score "
                  "(libfast semantics; source unreachable, see docstring)",
        "production_path": "pallas" if args.pallas else "jnp",
        "results": results,
        "all_detect_equal": all(r["detect_sets_equal"] for r in results),
        "all_scores_exact": all(r["scores_exact"] for r in results),
        "all_nms_equal": all(r["nms_sets_equal"] for r in results),
    }
    with open(os.path.join(REPO, "FAST10_ORACLE.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
