"""Pallas TPU kernel: FAST-10 corner score + 3x3 non-max suppression.

The VMEM-resident replacement for the jnp whole-image FAST path
(frontend/detect.py, itself the re-design of the reference's libfast SSE2
detector, /root/reference/src/corner_detector.cpp:91-134 + uzh-rpg/fast).

Why a kernel: the jnp formulation materializes a (16, H, W) circle stack and
16 arc-minima stacks — every op a round-trip through HBM. Here each grid
program DMAs one row-slab of the image into VMEM once, computes the 16
circle differences and the 16 length-10 arc minima by *slicing the slab in
place* (zero extra buffers beyond two accumulators), applies the segment
test, and writes back a single (TILE_H, W) nms-suppressed score block. HBM
traffic drops from ~50 arrays to exactly one image read + one score write.

Contract (matches detect.fast_score_10 + detect.nonmax_3x3 composed):
    out[y, x] = FAST-10 score   if score > threshold and (y,x) is the
                                 >=-max of its 3x3 masked neighborhood
                0               otherwise
Scores on the 3px image border are 0 (reference: FAST is undefined there).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from msckf_mono_tpu.frontend.detect import FAST_OFFSETS

HALO = 4  # 3px circle radius + 1px NMS ring
LANE = 128


def _fast_nms_kernel(img_ref, out_ref, slab, sem, *, threshold, tile_h, W_true, H_true):
    """One program: image b, padded rows [i*tile_h, i*tile_h + tile_h + 2·HALO).

    The wrapper pads each image by HALO rows top and bottom, so every tile's
    slab starts at the static-stride offset i*tile_h (a multiple of 8 —
    Mosaic rejects dynamic sublane starts it cannot prove 8-aligned) and the
    output window sits at the fixed slab offset HALO.
    """
    b = pl.program_id(0)
    i = pl.program_id(1)
    slab_h = tile_h + 2 * HALO
    start = i * tile_h  # padded-image coordinates

    # one HBM -> VMEM DMA of the slab
    dma = pltpu.make_async_copy(img_ref.at[b, pl.ds(start, slab_h)], slab, sem)
    dma.start()
    dma.wait()

    Wp = slab.shape[1]
    # score region: every slab row/col whose 3px circle fits in the slab.
    # rows [1, slab_h-1) x full width is enough: we only consume scores at
    # rows [off-1, off+tile_h+1) and off >= HALO-... (clamped tiles include
    # their own halo), and circle rows reach +-3 <= HALO-1 inside the slab.
    sh = slab_h - 2 * (HALO - 1)  # rows with full circle + NMS support
    r0 = HALO - 1

    center = slab[pl.ds(r0, sh), :]
    big = jnp.float32(1e9)

    # circle differences d_j, each produced by slicing the slab; arc minima
    # computed with two running accumulators (no 16-slab stack).
    def diff(j):
        dx, dy = FAST_OFFSETS[j]
        # column shift: slide the lane axis with pltpu.roll (wraps; wrapped
        # columns land outside the valid interior and are masked later).
        shifted = slab[pl.ds(r0 + dy, sh), :]
        if dx != 0:
            shifted = pltpu.roll(shifted, (-dx) % Wp, 1)
        return shifted - center

    # Each circle difference computed ONCE (16 lane rolls total; the naive
    # per-arc form recomputed them 10x = 160 rolls, the tile's hottest op
    # class), then the 16 length-10 circular arc minima by doubling:
    # min2 -> min4 -> min8, arc10[k] = min(min8[k], min2[k+8]) — 4 min ops
    # per arc instead of 9. Bright arcs minimize d, dark arcs minimize -d
    # (= -max d), sharing the same sweep on negated diffs.
    diffs = [diff(j) for j in range(16)]

    def arc10_max(ds):
        m2 = [jnp.minimum(ds[j], ds[(j + 1) % 16]) for j in range(16)]
        m4 = [jnp.minimum(m2[j], m2[(j + 2) % 16]) for j in range(16)]
        m8 = [jnp.minimum(m4[j], m4[(j + 4) % 16]) for j in range(16)]
        best = None
        for k in range(16):
            a = jnp.minimum(m8[k], m2[(k + 8) % 16])
            best = a if best is None else jnp.maximum(best, a)
        return best

    score = jnp.maximum(arc10_max(diffs), arc10_max([-d for d in diffs]))

    # interior mask in GLOBAL image coordinates (3px border invalid);
    # padded-image row start+r0 is global row start+r0-HALO
    rows = jax.lax.broadcasted_iota(jnp.int32, (sh, Wp), 0) + start + r0 - HALO
    cols = jax.lax.broadcasted_iota(jnp.int32, (sh, Wp), 1)
    interior = (
        (rows >= 3) & (rows < H_true - 3) & (cols >= 3) & (cols < W_true - 3)
    )
    s = jnp.where(interior & (score > threshold), score, -big)

    # 3x3 NMS on the masked score (matches detect.nonmax_3x3: keep >= max of
    # masked neighbors). Output row k = slab row HALO+k = s row HALO-r0+k =
    # s row 1+k, so the NMS window is exactly s — all slices static.
    sc = s
    neigh = jnp.full((tile_h, Wp), -big)
    for dy in (0, 1, 2):
        for dx in (-1, 0, 1):
            n = sc[dy : dy + tile_h, :]
            if dx != 0:
                n = pltpu.roll(n, (-dx) % Wp, 1)
            if dy == 1 and dx == 0:
                continue
            neigh = jnp.maximum(neigh, n)
    mine = sc[1 : 1 + tile_h, :]
    keep = (mine > -big) & (mine >= neigh)
    out_ref[0, :, :] = jnp.where(keep, mine, 0.0)


@functools.partial(jax.jit, static_argnames=("threshold", "tile_h", "interpret"))
def _fast_nms_batched(imgs, threshold: float, tile_h: int, interpret: bool):
    """(B, H, W) images -> (B, H, W) NMS-suppressed FAST-10 scores."""
    assert tile_h % 8 == 0, "tile_h must be a sublane multiple"
    B, H, W = imgs.shape
    Wp = -(-W // LANE) * LANE
    n_tiles = -(-H // tile_h)
    # HALO rows of padding top and bottom -> every slab start is static
    H_pad = n_tiles * tile_h + 2 * HALO
    img_p = jnp.zeros((B, H_pad, Wp), jnp.float32)
    img_p = img_p.at[:, HALO : HALO + H, :W].set(imgs.astype(jnp.float32))

    kernel = functools.partial(
        _fast_nms_kernel,
        threshold=float(threshold),
        tile_h=tile_h,
        W_true=W,
        H_true=H,
    )
    out = pl.pallas_call(
        kernel,
        grid=(B, n_tiles),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (1, tile_h, Wp), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, n_tiles * tile_h, Wp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((tile_h + 2 * HALO, Wp), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(img_p)
    return out[:, :H, :W]


@functools.lru_cache(maxsize=None)
def _fast_cv(threshold: float, tile_h: int, interpret: bool):
    """custom_vmap wrapper: a vmapped call folds its batch axes into the
    kernel's batch grid dimension (vmap's default pallas batching rule cannot
    handle the ANY-memory-space manual-DMA input block)."""

    @jax.custom_batching.custom_vmap
    def cv(img):
        return _fast_nms_batched(img[None], threshold, tile_h, interpret)[0]

    @cv.def_vmap
    def _rule(axis_size, in_batched, imgs):  # noqa: ANN001
        lead = imgs.shape[:-2]
        flat = imgs.reshape((-1,) + imgs.shape[-2:])
        out = _fast_nms_batched(flat, threshold, tile_h, interpret)
        return out.reshape(lead + out.shape[-2:]), True

    return cv


def fast_nms_score(img, threshold: float = 20.0, tile_h: int = 64, interpret: bool = False):
    # tile_h=64: the 16 live circle-difference tensors plus accumulators have
    # to fit the 16 MB scoped-VMEM stack; 120-row tiles measured 22.7 MB.
    """(H, W) image -> (H, W) NMS-suppressed FAST-10 score (0 = not a corner)."""
    return _fast_cv(float(threshold), int(tile_h), bool(interpret))(img)
