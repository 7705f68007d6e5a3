"""Corner detection: FAST-10 + score + 3x3 NMS + Shi-Tomasi grid selection.

Re-design of ``CornerDetector`` (/root/reference/src/corner_detector.cpp:8-134)
and the uzh-rpg/libfast native dependency as whole-image, batched jnp compute
(a Pallas kernel drop-in lives in ops/ once profiled):

* FAST-10 segment test (16-pixel Bresenham circle, >=10 contiguous brighter/
  darker by t=20, corner_detector.cpp:91-99);
* the FAST score = max threshold keeping the corner (fast_corner_score_10),
  computed in closed form as the max-over-arcs of min-over-arc |difference|;
* 3x3 non-max suppression on the FAST score (fast_nonmax_3x3);
* Shi-Tomasi min-eigenvalue over a 30x30 patch (corner_detector.cpp:38-79,
  from rpg_vikit) via integral images;
* per-grid-cell best corner above ``detection_threshold`` with an occupancy
  mask (corner_detector.cpp:105-133), grid sized ``(dim // n) + 1``.

Everything is mask-based with a fixed (n_cells,) output.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# (dx, dy) offsets of the 16-pixel Bresenham circle, in circular order.
FAST_OFFSETS = (
    (0, -3), (1, -3), (2, -2), (3, -1), (3, 0), (3, 1), (2, 2), (1, 3),
    (0, 3), (-1, 3), (-2, 2), (-3, 1), (-3, 0), (-3, -1), (-2, -2), (-1, -3),
)


def _circle_stack(img):
    """(16, H, W) of the circle-shifted image (roll; 3px border invalid)."""
    shifted = [jnp.roll(img, shift=(-dy, -dx), axis=(0, 1)) for dx, dy in FAST_OFFSETS]
    return jnp.stack(shifted, axis=0)


def fast_score_10(img, threshold: float = 20.0):
    """FAST-10 corner mask and score. img: (H, W) float. Returns (mask, score)."""
    c = img[None, :, :]
    circ = _circle_stack(img)
    diff = circ - c  # (16,H,W)

    def arc_min(d):
        # min over each length-10 circular arc -> (16,H,W)
        mins = []
        for k in range(16):
            idx = [(k + j) % 16 for j in range(10)]
            mins.append(jnp.min(d[jnp.asarray(idx)], axis=0))
        return jnp.stack(mins, axis=0)

    bright_arc = arc_min(diff)           # arcs where all 10 are brighter by m
    dark_arc = arc_min(-diff)
    score_b = jnp.max(bright_arc, axis=0)
    score_d = jnp.max(dark_arc, axis=0)
    score = jnp.maximum(score_b, score_d)
    mask = score > threshold

    # invalidate the 3px border contaminated by roll wraparound
    H, W = img.shape
    yy = jnp.arange(H)[:, None]
    xx = jnp.arange(W)[None, :]
    interior = (yy >= 3) & (yy < H - 3) & (xx >= 3) & (xx < W - 3)
    return mask & interior, jnp.where(interior, score, 0.0)


def nonmax_3x3(score, mask):
    """Keep corners that are the strict-or-first maximum of their 3x3 patch."""
    s = jnp.where(mask, score, -jnp.inf)
    neighborhood = jnp.full_like(s, -jnp.inf)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dx == 0 and dy == 0:
                continue
            neighborhood = jnp.maximum(neighborhood, jnp.roll(s, (dy, dx), (0, 1)))
    return mask & (s >= neighborhood) & (s > -jnp.inf)


def _integral_boxsum(img, half: int):
    """Box sum of side 2*half ending so the box is [u-half, u+half) x same in y.

    Mirrors the reference patch convention (corner_detector.cpp:49-72: x in
    [u-half, u+half), y in [v-half, v+half)).
    """
    H, W = img.shape
    ii = jnp.zeros((H + 1, W + 1), img.dtype)
    ii = ii.at[1:, 1:].set(jnp.cumsum(jnp.cumsum(img, axis=0), axis=1))

    # sum over rows [v-half, v+half) cols [u-half, u+half)
    # = ii[v+half, u+half] - ii[v-half, u+half] - ii[v+half, u-half] + ii[v-half, u-half]
    # The clipped corner lookups are STATIC slices of an edge-padded integral
    # image (fancy-index gathers here lowered to per-element loops on TPU —
    # round-3 image-pipeline trace).
    iip = jnp.pad(ii, ((half, half), (half, half)), mode="edge")
    h2 = 2 * half
    out = (
        iip[h2 : h2 + H, h2 : h2 + W]
        - iip[0:H, h2 : h2 + W]
        - iip[h2 : h2 + H, 0:W]
        + iip[0:H, 0:W]
    )
    return out


@functools.lru_cache(maxsize=None)
def _grad_box_matrices(H: int, W: int, half: int):
    """Static banded operators for the dense Shi-Tomasi response.

    Central difference along an axis and the [v-half, v+half) box sum (the
    reference's patch convention, corner_detector.cpp:49-72, clipped to the
    image like the integral-image formulation) are both banded linear maps,
    so the whole dense response is six matmuls — the TPU-native form. The
    double-cumsum integral image costs lane-axis shift relayouts that
    measured 21.8 ms per 64-image batch on v5e (round 5); these matmuls ride
    the MXU instead. Border rows/cols of the gradient operators are zero:
    the reference's interior mask (below) never consumes them, so the
    circular-roll wraparound of the old formulation is irrelevant here.
    numpy at trace time: the arrays become jit constants.
    """
    import numpy as np

    def grad(n):
        G = np.zeros((n, n), np.float32)
        for i in range(1, n - 1):
            G[i, i + 1] = 1.0
            G[i, i - 1] = -1.0
        return G

    def box(n):
        B = np.zeros((n, n), np.float32)
        for i in range(n):
            B[i, max(i - half, 0) : max(min(i + half, n), 0)] = 1.0
        return B

    return grad(H), grad(W), box(H), box(W)


def shi_tomasi_score(img, halfbox: int = 15, precision: str = "highest"):
    """Min-eigenvalue response per pixel (reference corner_detector.cpp:38-79).

    Gradients and box sums are banded matmuls (_grad_box_matrices); the
    default HIGHEST precision keeps the response exact f32 regardless of the
    caller's matmul-precision context (serving may pass "default" — 1-pass
    bf16, ~0.4% response rounding that only perturbs per-cell argmax
    tie-breaks; the image bench's ATE carries the measured cost)."""
    H, W = img.shape
    Gy, Gx, Bv, Bh = _grad_box_matrices(H, W, halfbox)
    Gy, Gx = jnp.asarray(Gy, img.dtype), jnp.asarray(Gx, img.dtype)
    Bv, Bh = jnp.asarray(Bv, img.dtype), jnp.asarray(Bh, img.dtype)
    dx = jnp.dot(img, Gx.T, precision=precision)      # I(x+1) - I(x-1)
    dy = jnp.dot(Gy, img, precision=precision)

    box_area = (2 * halfbox) ** 2
    Z = jnp.stack([dx * dx, dy * dy, dx * dy])        # (3, H, W)
    S = jnp.einsum("vy,cyx,ux->cvu", Bv, Z, Bh,
                   precision=precision) / (2.0 * box_area)
    dxx, dyy, dxy = S[0], S[1], S[2]

    tr = dxx + dyy
    det = dxx * dyy - dxy * dxy
    disc = jnp.sqrt(jnp.maximum(tr * tr - 4 * det, 0.0))
    score = 0.5 * (tr - disc)

    yy = jnp.arange(H)[:, None]
    xx = jnp.arange(W)[None, :]
    # reference returns 0 when the patch touches the 1px-padded border
    interior = (
        (yy - halfbox >= 1) & (yy + halfbox < H - 1)
        & (xx - halfbox >= 1) & (xx + halfbox < W - 1)
    )
    return jnp.where(interior, score, 0.0)


def _use_pallas_default() -> bool:
    import jax

    return jax.default_backend() == "tpu"


def detect_features(
    img,
    occupied_cells,
    n_rows: int = 10,
    n_cols: int = 10,
    fast_threshold: float = 20.0,
    detection_threshold: float = 40.0,
    use_pallas: bool | None = None,
    st_precision: str = "highest",
):
    """Full detection pipeline. Returns (xy (C,2), score (C,), valid (C,)) with
    C = n_rows*n_cols grid cells — at most one new corner per unoccupied cell.

    img: (H, W) float; occupied_cells: (C,) bool from current features.
    ``use_pallas`` selects the VMEM-resident FAST+NMS kernel
    (ops/fast_pallas.py); defaults to on for the TPU backend.
    """
    H, W = img.shape
    grid_h = H // n_rows + 1
    grid_w = W // n_cols + 1
    n_cells = n_rows * n_cols

    if use_pallas is None:
        use_pallas = _use_pallas_default()
    if use_pallas:
        from msckf_mono_tpu.ops import fast_pallas

        nms = fast_pallas.fast_nms_score(img, fast_threshold) > 0
    else:
        mask, fscore = fast_score_10(img, fast_threshold)
        nms = nonmax_3x3(fscore, mask)
    st = shi_tomasi_score(img, precision=st_precision)

    # Occupancy masks AFTER the tile reduction (below), not here: occupancy
    # is per-CELL, so the best corner within a cell is independent of it —
    # and keeping the (H, W) score map image-only lets XLA hoist the whole
    # pad+reshape+max reduction out of the filter batch in the shared-camera
    # pipeline (round-3 trace: this reduction ran per-filter, B times).
    scores = jnp.where(nms, st, -1.0)

    # Best-per-cell as TILE reductions: the grid cells are regular tiles, so
    # pad to a multiple of the cell size, reshape to (n_cells, cell_px) and
    # reduce — segment_max/min lowered to scatters (round-3 image trace).
    # Tile-local row-major order equals image row-major order within a cell,
    # so argmax's first-occurrence tie-break matches the old smallest-flat-
    # index rule exactly.
    Hp = n_rows * grid_h
    Wp = n_cols * grid_w
    sp = jnp.pad(scores, ((0, Hp - H), (0, Wp - W)), constant_values=-1.0)
    tiles = sp.reshape(n_rows, grid_h, n_cols, grid_w).transpose(0, 2, 1, 3)
    flat = tiles.reshape(n_cells, grid_h * grid_w)
    best = jnp.max(flat, axis=1)
    local = jnp.argmax(flat, axis=1)
    cy = jnp.arange(n_cells) // n_cols
    cx = jnp.arange(n_cells) % n_cols
    wy = (cy * grid_h + local // grid_w).astype(jnp.float32)
    wx = (cx * grid_w + local % grid_w).astype(jnp.float32)
    valid = (best > detection_threshold) & ~occupied_cells
    xy = jnp.stack([wx, wy], axis=-1)
    return jnp.where(valid[:, None], xy, 0.0), jnp.where(valid, best, 0.0), valid
