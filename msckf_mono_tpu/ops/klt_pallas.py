"""Pallas TPU kernel: one pyramid level of Lucas-Kanade feature tracking.

The TPU-native replacement for the gather-heavy jnp LK level
(frontend/klt.py:_track_level, itself the re-design of the reference's
cv::calcOpticalFlowPyrLK, /root/reference/src/corner_detector.cpp:136-194).

Why a kernel, and why this shape: per feature and per iteration, LK needs a
bilinearly-sampled (w, w) window at a fractional position. A jnp formulation
is ~4 * w^2 independent image gathers per feature per iteration — the single
worst op class for the TPU vector unit. But the window grid is *integer*
offsets from one fractional center, so the whole window sample factors into

    rows:  (1-fy) * img[by : by+TS, :]  +  fy * img[by+1 : by+1+TS, :]
    cols:  rows @ Sx,   Sx[bx+c, c] = 1-fx,  Sx[bx+c+1, c] = fx

i.e. one 8-aligned sublane slice, one dynamic lane ROTATION (bx to lane 0 +
two static slices for the fractional x-interp), and one small banded matmul
for the y-interp — no gathers at all. (v2 used a full-width (Wp, LANE)
column matmul instead of the rotation; that made the kernel MXU-bound at
~19 MFLOP per GN iteration vs ~0.5 now.) The image level lives in VMEM for
the whole call (grid programs revisit the same block); each grid program
tracks one feature through Gauss-Newton with a real convergence exit.

Mosaic lessons (v1 of this kernel hung the compiler; each item below was a
candidate and v2 removes all of them):
* no `lax.cond` with function branches inside `fori_loop` — the convergence
  early-exit (reference cv::TermCriteria eps, corner_detector.cpp:206) is a
  carried `done` flag masking the position update instead;
* no dynamic slicing on the LANE dimension (v1 sliced a 256-wide column slab
  at a runtime lane offset) — the banded Sx matmul spans the full padded
  image width, so only sublane (row) bases are dynamic;
* f32 loop carries only.

Geometry matches frontend/klt.py exactly for interior features: template
gradients are central differences of bilinear samples (linear in the image,
so identical to differencing a (w+2, w+2) sample grid), the 2x2 normal solve
and min-eigenvalue gate reuse the same formulas. Border behavior differs
only in clamping details (the jnp path clamps each sample; here the image is
edge-replicated by `half+2` px and slice bases are clamped) — callers reject
border/out-of-image features either way (corner_detector.cpp:176-193).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
PACK = 4  # features per grid program (see _track_level_batched)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _klt_level_kernel(
    ptp_ref, ptc_ref, valid_ref,  # SMEM (1,F,·) blocks of stream b's features
    img_prev_ref, img_cur_ref,    # VMEM (1,Hp,Wp) block of stream b's level
    out_pt_ref, out_good_ref,     # SMEM (1,F,·) output blocks
    *,
    half: int, ts: int, pad: int, max_iters: int, eps: float, min_eig_thr: float,
    pack: int,
):
    # Per-feature scalars travel as FULL SMEM arrays indexed with
    # program_id — Mosaic rejects (1, 2) SMEM blocks (block dims must divide
    # (8, 128) or equal the array's).
    gidx = pl.program_id(1)
    w = 2 * half + 1
    Hp, Wp = img_prev_ref.shape[1:]
    f32 = jnp.float32

    # Iotas for the banded y-interpolation matrix.
    yrow = jax.lax.broadcasted_iota(jnp.int32, (ts, ts + 8), 0)
    ycol = jax.lax.broadcasted_iota(jnp.int32, (ts, ts + 8), 1)
    wrow = jax.lax.broadcasted_iota(jnp.int32, (ts, LANE), 0)
    wcol = jax.lax.broadcasted_iota(jnp.int32, (ts, LANE), 1)
    # valid window cells: sample-grid interior (gradient margin stripped)
    wm = ((wrow >= 1) & (wrow < 1 + w) & (wcol >= 1) & (wcol < 1 + w)).astype(f32)

    def sample(img_ref, px, py):
        """Bilinear (ts, LANE) sample grid with top-left at (p - half - 1).

        Mosaic requires sublane slice bases to be provably 8-aligned, so the
        load happens at by8 = 8*(by//8) and the row remainder rides in the
        banded y-interpolation matrix. Columns: a dynamic LANE-axis rotation
        brings bx to lane 0, then the fractional x-interp is two static
        slices — the v2 full-width (Wp x LANE) column matmul made the whole
        kernel MXU-bound (~19 MFLOP per GN iteration vs ~0.5 here).
        """
        bxf = px - f32(half + 1) + f32(pad)
        byf = py - f32(half + 1) + f32(pad)
        # The roll is CIRCULAR, so the only constraint is that the USED
        # window columns (bx+1 .. bx+w+1 of the rotated row) don't wrap —
        # clip to Wp - w - 3, NOT Wp - LANE - 1: the old LANE-based bound
        # pinned right-side features at small pyramid levels (Wp == 256,
        # valid width > 129) to a wrong window base, which seeded level-0
        # tracking ~4 px off and produced a 2 px endpoint error tail
        # (measured round 4: level-2 Pallas-vs-jnp max 1.15 px, image
        # pipeline ATE 1.05 vs 0.25).
        bx = jnp.clip(jnp.floor(bxf), 0, Wp - (2 * half + 1) - 3).astype(jnp.int32)
        by = jnp.clip(jnp.floor(byf), 0, Hp - ts - 9).astype(jnp.int32)
        fx = jnp.clip(bxf - bx.astype(f32), 0.0, 1.0)
        fy = jnp.clip(byf - by.astype(f32), 0.0, 1.0)
        by8 = pl.multiple_of((by // 8) * 8, 8)
        rem = by - by8  # in [0, 8)
        rows_a = img_ref[0, pl.ds(by8, ts + 8), :]               # (ts+8, Wp)
        rot = pltpu.roll(rows_a, (-bx) % Wp, 1)                  # bx -> lane 0
        xwin = (1.0 - fx) * rot[:, :LANE] + fx * rot[:, 1 : LANE + 1]
        sy = jnp.where(ycol == yrow + rem, 1.0 - fy, 0.0) + jnp.where(
            ycol == yrow + rem + 1, fy, 0.0
        )                                                        # (ts, ts+8)
        return jnp.dot(sy, xwin, preferred_element_type=f32)     # (ts, LANE)

    # ---- PACK features per grid program (python-unrolled) ----
    # The per-program fixed overhead dominated the image pipeline at one
    # feature per program (~16k programs/frame at 64 streams x 64 features x
    # 4 levels — round-3 trace); packing amortizes it. One shared while_loop
    # runs until every packed feature converges, with per-feature done masks
    # freezing finished tracks (same math as the single-feature loop).
    feats = []
    for k in range(pack):
        fidx = gidx * pack + k
        px, py = ptp_ref[0, fidx, 0], ptp_ref[0, fidx, 1]
        cx0, cy0 = ptc_ref[0, fidx, 0], ptc_ref[0, fidx, 1]

        tpl = sample(img_prev_ref, px, py)
        ix = 0.5 * (pltpu.roll(tpl, LANE - 1, 1) - pltpu.roll(tpl, 1, 1)) * wm
        iy = 0.5 * (pltpu.roll(tpl, ts - 1, 0) - pltpu.roll(tpl, 1, 0)) * wm

        gxx = jnp.sum(ix * ix)
        gxy = jnp.sum(ix * iy)
        gyy = jnp.sum(iy * iy)
        win_n = f32(w * w)
        tr = (gxx + gyy) / win_n
        det = (gxx * gyy - gxy * gxy) / (win_n * win_n)
        min_eig = 0.5 * (tr - jnp.sqrt(jnp.maximum(tr * tr - 4.0 * det, 0.0)))
        good = (valid_ref[0, fidx, 0] != 0) & (min_eig > f32(min_eig_thr))
        det_g = gxx * gyy - gxy * gxy
        det_g = jnp.where(jnp.abs(det_g) > 1e-12, det_g, 1e-12)
        feats.append(dict(tpl=tpl, ix=ix, iy=iy, gxx=gxx, gxy=gxy, gyy=gyy,
                          det_g=det_g, good=good, cx0=cx0, cy0=cy0))

    def gn_cond(carry):
        i = carry[0]
        done_all = carry[1 + 2 * pack:]
        alldone = done_all[0]
        for d in done_all[1:]:
            alldone = jnp.minimum(alldone, d)
        return (i < max_iters) & (alldone < 0.5)

    def gn_step(carry):
        i = carry[0]
        cs = list(carry[1 : 1 + 2 * pack])
        ds = list(carry[1 + 2 * pack :])
        for k in range(pack):
            fd = feats[k]
            cx, cy, done = cs[2 * k], cs[2 * k + 1], ds[k]
            cur = sample(img_cur_ref, cx, cy)
            diff = (cur - fd["tpl"]) * wm
            bx_a = jnp.sum(diff * fd["ix"])
            by_a = jnp.sum(diff * fd["iy"])
            dx = -(fd["gyy"] * bx_a - fd["gxy"] * by_a) / fd["det_g"]
            dy = -(-fd["gxy"] * bx_a + fd["gxx"] * by_a) / fd["det_g"]
            live = 1.0 - done
            cs[2 * k] = cx + dx * live
            cs[2 * k + 1] = cy + dy * live
            ds[k] = jnp.maximum(
                done, jnp.where(jnp.sqrt(dx * dx + dy * dy) < f32(eps), 1.0, 0.0)
            )
        return tuple([i + 1] + cs + ds)

    init = [jnp.int32(0)]
    for k in range(pack):
        init += [feats[k]["cx0"], feats[k]["cy0"]]
    for k in range(pack):
        init.append(jnp.where(feats[k]["good"], 0.0, 1.0))
    out = jax.lax.while_loop(gn_cond, gn_step, tuple(init))
    cs = out[1 : 1 + 2 * pack]
    for k in range(pack):
        fidx = gidx * pack + k
        good = feats[k]["good"]
        out_pt_ref[0, fidx, 0] = jnp.where(good, cs[2 * k], feats[k]["cx0"])
        out_pt_ref[0, fidx, 1] = jnp.where(good, cs[2 * k + 1], feats[k]["cy0"])
        out_good_ref[0, fidx, 0] = good.astype(jnp.int32)


@functools.partial(
    jax.jit,
    static_argnames=("window_size", "max_iters", "eps", "min_eigen_threshold", "interpret"),
)
def _track_level_batched(
    img_prev,
    img_cur,
    pts_prev,
    pts_cur,
    valid,
    window_size: int,
    max_iters: int,
    eps: float,
    min_eigen_threshold: float,
    interpret: bool,
):
    """Batched LK level: images x (B,F,2) points -> (B,F,2), (B,F).

    Images may be (B, H, W) per-stream or (1, H, W) SHARED across the batch
    (the Monte-Carlo pipeline): shared images are padded once and every grid
    program reads block 0 — no B-fold broadcast ever materializes.
    """
    half = window_size // 2
    ts = _round_up(2 * half + 4, 8)  # sample rows: tw + 1 interp row, padded
    pad = half + 2
    B, F = pts_prev.shape[0], pts_prev.shape[1]
    Bi = img_prev.shape[0]
    assert Bi in (1, B), (Bi, B)
    H, W = img_prev.shape[1:]

    # +24 extra bottom rows: the aligned sublane load spans [by8, by8+ts+8)
    # and by8 can sit up to 7 rows below by, so bottom-edge features need
    # slack beyond the replication pad or their sample base gets clamped.
    Hp = max(_round_up(H + 2 * pad, 8) + 24, ts + 24)
    Wp = max(_round_up(W + 2 * pad, LANE), 2 * LANE)

    def pad_img(img):
        p = jnp.pad(
            img.astype(jnp.float32), ((0, 0), (pad, pad), (pad, pad)), mode="edge"
        )
        return jnp.pad(
            p, ((0, 0), (0, Hp - p.shape[1]), (0, Wp - p.shape[2]))
        )

    # Feature packing: amortize per-grid-program overhead (see kernel
    # docstring). PACK features/program unless F doesn't divide; the shared
    # while_loop couples packed features' convergence (slowest-of-pack), so
    # bigger packs trade fewer programs for more masked iterations —
    # measured on TPU v5e (tools/microbench_klt_pack.py, 4-level track of
    # (256, 64) points on rendered frames): pack 2 = 117 ms, 4 = 110 ms,
    # 8 = 116 ms, 16 = 151 ms — 4 is the optimum.
    pack = PACK
    while F % pack:
        pack -= 1

    kernel = functools.partial(
        _klt_level_kernel,
        half=half, ts=ts, pad=pad, max_iters=max_iters,
        eps=float(eps), min_eig_thr=float(min_eigen_threshold), pack=pack,
    )
    out_pt, out_good = pl.pallas_call(
        kernel,
        grid=(B, F // pack),
        in_specs=[
            pl.BlockSpec((1, F, 2), lambda b, i: (b, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, F, 2), lambda b, i: (b, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, F, 1), lambda b, i: (b, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, Hp, Wp), (lambda b, i: (b, 0, 0)) if Bi != 1
                         else (lambda b, i: (0, 0, 0)), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Hp, Wp), (lambda b, i: (b, 0, 0)) if Bi != 1
                         else (lambda b, i: (0, 0, 0)), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, F, 2), lambda b, i: (b, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, F, 1), lambda b, i: (b, 0, 0), memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, F, 2), jnp.float32),
            jax.ShapeDtypeStruct((B, F, 1), jnp.int32),
        ),
        interpret=interpret,
    )(
        pts_prev.astype(jnp.float32),
        pts_cur.astype(jnp.float32),
        valid.astype(jnp.int32)[:, :, None],
        pad_img(img_prev),
        pad_img(img_cur),
    )
    return out_pt, out_good[:, :, 0] != 0


@functools.lru_cache(maxsize=None)
def _track_cv(window_size: int, max_iters: int, eps: float,
              min_eigen_threshold: float, interpret: bool):
    """custom_vmap wrapper: a vmapped call (the image-in-the-loop pipeline
    batches camera streams) folds its batch axis into the kernel's batch
    grid dimension instead of going through vmap's default pallas rule."""

    @jax.custom_batching.custom_vmap
    def cv(img_prev, img_cur, pts_prev, pts_cur, valid):
        pt, good = _track_level_batched(
            img_prev[None], img_cur[None], pts_prev[None], pts_cur[None],
            valid[None], window_size, max_iters, eps, min_eigen_threshold,
            interpret,
        )
        return pt[0], good[0]

    @cv.def_vmap
    def _rule(axis_size, in_batched, img_prev, img_cur, pts_prev, pts_cur, valid):  # noqa: ANN001
        def bc(x, b):
            return x if b else jnp.broadcast_to(x[None], (axis_size,) + x.shape)

        # Unbatched IMAGES stay (1, H, W): the kernel reads block 0 for every
        # stream (shared-camera Monte-Carlo mode) — broadcasting them B-fold
        # here would materialize B padded pyramid copies in HBM. The kernel
        # requires both images at the same batch size, so a mixed case (one
        # shared, one per-stream) broadcasts the shared one.
        i_b, ic_b, pp_b, pc_b, v_b = in_batched
        if i_b == ic_b:
            img_prev = img_prev if i_b else img_prev[None]
            img_cur = img_cur if ic_b else img_cur[None]
        else:
            img_prev = bc(img_prev, i_b)
            img_cur = bc(img_cur, ic_b)
        pts_prev = bc(pts_prev, pp_b)
        pts_cur = bc(pts_cur, pc_b)
        valid = bc(valid, v_b)
        out = _track_level_batched(
            img_prev, img_cur, pts_prev, pts_cur, valid,
            window_size, max_iters, eps, min_eigen_threshold, interpret,
        )
        return out, (True, True)

    return cv


def track_level(
    img_prev,
    img_cur,
    pts_prev,
    pts_cur,
    valid,
    window_size: int = 31,
    max_iters: int = 30,
    eps: float = 1.0,
    min_eigen_threshold: float = 1e-5,
    interpret: bool = False,
):
    """One LK level for all features. Same contract as klt._track_level:
    (pts_out (F,2), good (F,)) in the level's pixel coordinates."""
    fn = _track_cv(
        int(window_size), int(max_iters), float(eps),
        float(min_eigen_threshold), bool(interpret)
    )
    return fn(img_prev, img_cur, pts_prev, pts_cur, valid)
