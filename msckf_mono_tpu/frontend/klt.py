"""Pyramidal Lucas-Kanade optical flow.

Re-design of ``CornerTracker`` (/root/reference/src/corner_detector.cpp:136-194,
cv::calcOpticalFlowPyrLK with OPTFLOW_USE_INITIAL_FLOW) as batched jnp compute:

* Gaussian pyramid via the standard 5-tap [1,4,6,4,1]/16 pyrDown kernel;
* per level, forward-additive LK over a square window with fixed iteration
  count and the reference's termination criteria baked in as masks
  (configure(51, 1e-5, 4, 30, 1.0) at corner_detector.cpp:206 — note the
  eps=1.0px criterion);
* OPTFLOW_USE_INITIAL_FLOW semantics: the caller provides the predicted
  position at full resolution, used as the starting point at the top level;
* ``min_eigen_threshold`` on the normalized spatial-gradient matrix and
  out-of-image checks produce the status mask;
* the caller applies the reference's post-filters (|flow| <= 25px, in-image,
  corner_detector.cpp:176-193).

All features track in parallel as one (F, win, win) batch of gathers — the
gather-heavy inner loop is the designated Pallas target (SURVEY.md §7 "hard
parts").
"""

from __future__ import annotations

import functools
from functools import partial

import jax
import jax.numpy as jnp


@functools.lru_cache(maxsize=None)
def _down_matrices(H: int, W: int):
    """Static banded downsample operators for one pyrDown level.

    ``out = Av @ img @ Ah.T`` computes exactly the 5-tap [1,4,6,4,1]/16
    edge-clamped blur + 2x subsample: ``Av[i, clip(2i + t - 2)] += k[t]``.
    Expressing pyrDown as two matmuls instead of shifted adds + ``[::2]``
    strided slices is the TPU-native form — lane-axis shifts and stride-2
    lane slices each lower to full-image relayouts (measured round 5,
    batch-64 independent streams: 163 ms per frame-batch for the shift-add
    pyramid vs ~1 ms of MXU time here; the banded matrices are ~98% zeros
    but MXU flops are free at this size). numpy at trace time: the arrays
    become jit constants.
    """
    import numpy as np

    k = np.asarray([1.0, 4.0, 6.0, 4.0, 1.0], np.float32) / 16.0

    def band(n_out, n_in):
        A = np.zeros((n_out, n_in), np.float32)
        for i in range(n_out):
            for t in range(5):
                A[i, min(max(2 * i + t - 2, 0), n_in - 1)] += k[t]
        return A

    return band(-(-H // 2), H), band(-(-W // 2), W)


def _pyr_down_batched(imgs, precision: str):
    """(..., H, W) -> (..., ceil(H/2), ceil(W/2)) pyrDown as TWO large
    matmuls: all leading axes fold into the matmul M dimension (horizontal
    pass) / N dimension (vertical pass, via one cheap transpose), so a
    64-stream batch runs one (B*H, W)x(W, Wo) and one (Ho, H)x(H, B*Wo)
    product at full MXU utilization instead of B thin batched matmuls."""
    lead = imgs.shape[:-2]
    H, W = imgs.shape[-2:]
    B = 1
    for d in lead:
        B *= d
    Av, Ah = _down_matrices(H, W)
    Av = jnp.asarray(Av, imgs.dtype)
    Ah = jnp.asarray(Ah, imgs.dtype)
    Ho, Wo = Av.shape[0], Ah.shape[0]
    h = jnp.dot(imgs.reshape(B * H, W), Ah.T, precision=precision)  # (B*H, Wo)
    hT = h.reshape(B, H, Wo).transpose(1, 0, 2).reshape(H, B * Wo)
    v = jnp.dot(Av, hT, precision=precision)                        # (Ho, B*Wo)
    return v.reshape(Ho, B, Wo).transpose(1, 0, 2).reshape(lead + (Ho, Wo))


@functools.lru_cache(maxsize=None)
def _pyr_down_fn(precision: str):
    """custom_vmap wrapper per precision tier: a vmapped call (the
    independent-streams image pipeline) folds the batch into the matmul
    dimensions via _pyr_down_batched."""

    @jax.custom_batching.custom_vmap
    def pd(img):
        return _pyr_down_batched(img, precision)

    @pd.def_vmap
    def _rule(axis_size, in_batched, imgs):  # noqa: ANN001
        (b,) = in_batched
        # unbatched (shared-camera in_axes=None) stays unbatched: ONE
        # pyramid, never axis_size broadcast copies
        return _pyr_down_batched(imgs, precision), b

    return pd


def _pyr_down(img, precision: str = "highest"):
    """Blur with [1,4,6,4,1]/16 edge-clamped separable kernel, 2x subsample
    (cv2 buildOpticalFlowPyramid's pyrDown semantics), as two banded matmuls
    — see _down_matrices. The default HIGHEST precision keeps it exact f32
    regardless of the caller's matmul-precision context (images are 0..255;
    bf16 passes cost ~0.25 intensity levels of rounding in the KLT
    templates); serving pipelines may pass "default" (1-pass bf16, measured
    ATE cost on the image bench — FrontendConfig.image_precision)."""
    return _pyr_down_fn(precision)(img)


def build_pyramid(img, levels: int, precision: str = "highest"):
    pyr = [img]
    for _ in range(levels):
        pyr.append(_pyr_down(pyr[-1], precision))
    return tuple(pyr)


def _bilinear(img, y, x):
    """Bilinear sample; clamps to the border. y/x arbitrary shape."""
    H, W = img.shape
    x0 = jnp.clip(jnp.floor(x), 0, W - 2)
    y0 = jnp.clip(jnp.floor(y), 0, H - 2)
    xi = x0.astype(jnp.int32)
    yi = y0.astype(jnp.int32)
    fx = jnp.clip(x - x0, 0.0, 1.0)
    fy = jnp.clip(y - y0, 0.0, 1.0)
    i00 = img[yi, xi]
    i01 = img[yi, xi + 1]
    i10 = img[yi + 1, xi]
    i11 = img[yi + 1, xi + 1]
    return (
        i00 * (1 - fy) * (1 - fx)
        + i01 * (1 - fy) * fx
        + i10 * fy * (1 - fx)
        + i11 * fy * fx
    )


def _window_grid(half: int):
    d = jnp.arange(-half, half + 1, dtype=jnp.float32)
    return jnp.meshgrid(d, d, indexing="ij")  # (dy, dx)


def _track_level(img_prev, img_cur, pts_prev, pts_cur, valid, half, iters, eps, min_eig_thr):
    """One pyramid level of LK for all features. pts are (F,2) xy."""
    gy, gx = _window_grid(half)             # (w, w)
    win_n = (2 * half + 1) ** 2

    def one(pt_prev, pt_cur, ok):
        px, py = pt_prev[0], pt_prev[1]
        ys = py + gy
        xs = px + gx
        # template and its gradients from the previous image
        tpl = _bilinear(img_prev, ys, xs)
        ix = 0.5 * (_bilinear(img_prev, ys, xs + 1) - _bilinear(img_prev, ys, xs - 1))
        iy = 0.5 * (_bilinear(img_prev, ys + 1, xs) - _bilinear(img_prev, ys - 1, xs))
        gxx = jnp.sum(ix * ix)
        gxy = jnp.sum(ix * iy)
        gyy = jnp.sum(iy * iy)
        # min eigenvalue of G / window-size (cv semantics)
        tr = (gxx + gyy) / win_n
        det = (gxx * gyy - gxy * gxy) / (win_n * win_n)
        min_eig = 0.5 * (tr - jnp.sqrt(jnp.maximum(tr * tr - 4 * det, 0.0)))
        good = ok & (min_eig > min_eig_thr)

        det_g = gxx * gyy - gxy * gxy
        det_g = jnp.where(jnp.abs(det_g) > 1e-12, det_g, 1e-12)

        def body(i, carry):
            pt, done = carry
            cys = pt[1] + gy
            cxs = pt[0] + gx
            diff = _bilinear(img_cur, cys, cxs) - tpl
            bx = jnp.sum(diff * ix)
            by = jnp.sum(diff * iy)
            # solve G d = -b
            dx = -(gyy * bx - gxy * by) / det_g
            dy = -(-gxy * bx + gxx * by) / det_g
            step = jnp.stack([dx, dy])
            new_pt = jnp.where(done, pt, pt + step)
            done = done | (jnp.linalg.norm(step) < eps)
            return new_pt, done

        pt_out, _ = jax.lax.fori_loop(0, iters, body, (pt_cur, ~good))
        return jnp.where(good, pt_out, pt_cur), good

    return jax.vmap(one)(pts_prev, pts_cur, valid)


@partial(
    jax.jit,
    static_argnames=("window_size", "max_level", "max_iters", "use_pallas"),
)
def track_features(
    img_prev,
    img_cur,
    pts_prev,
    pts_pred,
    valid,
    window_size: int = 31,
    max_level: int = 4,
    max_iters: int = 30,
    eps: float = 1.0,
    min_eigen_threshold: float = 1e-5,
    use_pallas: bool | None = None,
):
    """Track (F,2) points from img_prev to img_cur starting at pts_pred.

    Returns (pts_out (F,2), status (F,)). Reference defaults: window 51,
    4 levels, 30 iters, eps 1.0 (corner_detector.cpp:206); window default here
    is 31 for TPU cost — pass 51 for strict parity.
    """
    pyr_prev = build_pyramid(img_prev, max_level)
    pyr_cur = build_pyramid(img_cur, max_level)
    return track_features_pyr(
        pyr_prev, pyr_cur, pts_prev, pts_pred, valid,
        window_size=window_size, max_iters=max_iters, eps=eps,
        min_eigen_threshold=min_eigen_threshold, use_pallas=use_pallas,
    )


def _use_pallas_default() -> bool:
    # TPU-on since round 3: the v2 kernel (ops/klt_pallas.py — banded-matmul
    # bilinear sampling, no lax.cond, 8-aligned sublane loads) compiles clean
    # on Mosaic and validates at 1.73 ms vs 82.8 ms for this jnp path (47.8x,
    # good-agreement 1.00, max 0.01 px; tools/validate_pallas_tpu.py --klt).
    try:
        import jax

        return jax.default_backend() == "tpu"
    except Exception:  # noqa: BLE001
        return False


def track_features_pyr(
    pyr_prev,
    pyr_cur,
    pts_prev,
    pts_pred,
    valid,
    window_size: int = 31,
    max_iters: int = 30,
    eps: float = 1.0,
    min_eigen_threshold: float = 1e-5,
    use_pallas: bool | None = None,
):
    """Pyramid-input variant (pyramids as tuples of (H/2^l, W/2^l) arrays) —
    lets scanned/functional callers reuse the previous frame's pyramid.

    ``use_pallas`` selects the VMEM-resident matmul-sampling LK kernel
    (ops/klt_pallas.py); defaults to on for the TPU backend, where the jnp
    path's per-pixel window gathers are pathological.
    """
    half = window_size // 2
    max_level = len(pyr_prev) - 1
    # cv2 semantics: buildOpticalFlowPyramid stops before levels smaller
    # than the tracking window, so calcOpticalFlowPyrLK with win 51 on
    # 480x752 effectively runs 4 levels even when maxLevel=4 asks for 5.
    # Without this clamp a 51-px window on a 30-px top level spans the whole
    # edge-padded image — garbage gradients that seed level-0 tracking off
    # (measured round 4: image-pipeline ATE 1.20 at win51/5lv, 0.25 at 4lv).
    while max_level > 0 and min(pyr_prev[max_level].shape) < window_size + 2:
        max_level -= 1
    if use_pallas is None:
        use_pallas = _use_pallas_default()
    if use_pallas:
        from msckf_mono_tpu.ops import klt_pallas

        def level_fn(ip, ic, pp, pc, st):
            return klt_pallas.track_level(
                ip, ic, pp, pc, st,
                window_size=window_size, max_iters=max_iters,
                eps=eps, min_eigen_threshold=min_eigen_threshold,
            )
    else:
        def level_fn(ip, ic, pp, pc, st):
            return _track_level(
                ip, ic, pp, pc, st, half, max_iters, eps, min_eigen_threshold
            )

    scale_top = 2.0**max_level
    pts_p = pts_prev / scale_top
    pts_c = pts_pred / scale_top
    status = valid

    for lvl in range(max_level, -1, -1):
        if lvl != max_level:
            pts_p = pts_prev / (2.0**lvl)
            pts_c = pts_c * 2.0
        pts_c, good = level_fn(
            pyr_prev[lvl], pyr_cur[lvl], pts_p, pts_c, status,
        )
        # cv keeps tracking through levels; status finalized at level 0
        if lvl == 0:
            status = status & good

    H, W = pyr_cur[0].shape
    in_img = (
        (pts_c[:, 0] >= 0) & (pts_c[:, 0] <= W) & (pts_c[:, 1] >= 0) & (pts_c[:, 1] <= H)
    )
    status = status & in_img
    return pts_c, status


def reject_outliers(pts_prev, pts_cur, status, img_shape, max_flow: float = 25.0):
    """The reference's post-track rejection (corner_detector.cpp:176-193)."""
    H, W = img_shape
    flow = jnp.linalg.norm(pts_cur - pts_prev, axis=-1)
    ok = (
        status
        & (flow <= max_flow)
        & (pts_cur[:, 0] >= 0) & (pts_cur[:, 0] <= W)
        & (pts_cur[:, 1] >= 0) & (pts_cur[:, 1] <= H)
    )
    return ok
