import numpy as np
import jax
import jax.numpy as jnp

from msckf_mono_tpu.frontend import detect, klt, ransac, undistort
from msckf_mono_tpu.utils import quat


# ---------- undistortion ----------

EUROC_K = np.array([[458.654, 0, 367.215], [0, 457.296, 248.375], [0, 0, 1.0]])
EUROC_DIST = (-0.28340811, 0.07395907, 0.00019359, 1.76187114e-05)


def test_radtan_roundtrip():
    rng = np.random.default_rng(0)
    xy = rng.uniform(-0.5, 0.5, size=(64, 2))
    xd = undistort.distort_radtan(jnp.asarray(xy), EUROC_DIST)
    # iters=20 checks the fixed-point math converges to the true inverse; the
    # default (5) intentionally matches cv::undistortPoints' default criteria
    # instead (~1.2e-3 normalized from true on EuRoC distortion — the
    # reference's own output; see tests/test_cv_parity.py).
    xu = undistort.undistort_radtan(xd, EUROC_DIST, iters=20)
    np.testing.assert_allclose(np.asarray(xu), xy, atol=1e-6)
    xu5 = undistort.undistort_radtan(xd, EUROC_DIST)
    assert float(jnp.abs(xu5 - jnp.asarray(xy)).max()) < 5e-3


def test_equidistant_roundtrip():
    rng = np.random.default_rng(1)
    coeffs = (-0.013, 0.02, -0.02, 0.008)
    xy = rng.uniform(-0.6, 0.6, size=(64, 2))
    xd = undistort.distort_equidistant(jnp.asarray(xy), coeffs)
    xu = undistort.undistort_equidistant(xd, coeffs)
    np.testing.assert_allclose(np.asarray(xu), xy, atol=1e-6)


def test_undistort_points_pixel_path():
    rng = np.random.default_rng(2)
    xy_norm = rng.uniform(-0.4, 0.4, size=(16, 2))
    xd = undistort.distort_radtan(jnp.asarray(xy_norm), EUROC_DIST)
    uv_px = undistort.normalized_to_pixels(xd, jnp.asarray(EUROC_K))
    out = undistort.undistort_points(uv_px, jnp.asarray(EUROC_K), EUROC_DIST, "radtan")
    np.testing.assert_allclose(np.asarray(out), xy_norm, atol=1e-5)


# ---------- synthetic imagery ----------

def _render_corners(h, w, pts, half=4, bg=30.0, fg=220.0, seed=0):
    """Dark image with bright axis-aligned squares whose corners are at pts."""
    rng = np.random.default_rng(seed)
    img = np.full((h, w), bg) + rng.normal(size=(h, w)) * 2.0
    for x, y in pts:
        xi, yi = int(round(x)), int(round(y))
        img[max(yi, 0) : yi + 2 * half, max(xi, 0) : xi + 2 * half] = fg
    return np.clip(img, 0, 255)


def _render_texture(h, w, seed=0, octaves=4):
    """Smooth random texture with plenty of gradient structure."""
    rng = np.random.default_rng(seed)
    img = np.zeros((h, w))
    for o in range(octaves):
        s = 2**o
        small = rng.normal(size=(h // (8 * s) + 2, w // (8 * s) + 2))
        # bilinear upsample
        ys = np.linspace(0, small.shape[0] - 1.001, h)
        xs = np.linspace(0, small.shape[1] - 1.001, w)
        y0 = ys.astype(int)
        x0 = xs.astype(int)
        fy = (ys - y0)[:, None]
        fx = (xs - x0)[None, :]
        img += (
            small[y0][:, x0] * (1 - fy) * (1 - fx)
            + small[y0][:, x0 + 1] * (1 - fy) * fx
            + small[y0 + 1][:, x0] * fy * (1 - fx)
            + small[y0 + 1][:, x0 + 1] * fy * fx
        ) * (120.0 / (o + 1))
    img = img - img.min()
    return (img / img.max() * 255.0).astype(np.float64)


# ---------- detection ----------

def test_fast_detects_square_corners():
    pts = [(60.0, 50.0), (160.0, 90.0), (260.0, 140.0)]
    img = _render_corners(240, 320, pts)
    occupied = jnp.zeros((100,), bool)
    xy, score, valid = detect.detect_features(
        jnp.asarray(img, jnp.float32), occupied, 10, 10
    )
    found = np.asarray(xy)[np.asarray(valid)]
    assert len(found) >= len(pts)
    for p in pts:
        d = np.min(np.linalg.norm(found - np.asarray(p), axis=1))
        assert d <= 8.0, f"corner {p} not found (nearest {d:.1f}px)"


def test_detect_respects_occupancy():
    pts = [(60.0, 50.0)]
    img = _render_corners(240, 320, pts)
    n_rows = n_cols = 10
    gh, gw = 240 // n_rows + 1, 320 // n_cols + 1
    cell = (50 // gh) * n_cols + (60 // gw)
    occupied = jnp.zeros((100,), bool).at[cell].set(True)
    xy, score, valid = detect.detect_features(
        jnp.asarray(img, jnp.float32), occupied, n_rows, n_cols
    )
    found = np.asarray(xy)[np.asarray(valid)]
    # no returned corner may come from the occupied cell (the square's other
    # corners live in neighboring cells and are legitimately returned)
    for x, y in found:
        assert (int(y) // gh) * n_cols + int(x) // gw != cell


def test_shi_tomasi_positive_on_corner():
    img = _render_corners(120, 160, [(80.0, 60.0)])
    st = np.asarray(detect.shi_tomasi_score(jnp.asarray(img, jnp.float32)))
    assert st[60, 80] > 40.0
    assert st[20, 20] < 5.0  # flat region


# ---------- KLT ----------

def test_klt_tracks_pure_translation():
    base = _render_texture(240, 320, seed=3)
    dx, dy = 3.6, -2.3
    # shift via numpy bilinear sampling
    ys, xs = np.mgrid[0:240, 0:320].astype(np.float64)
    from scipy.ndimage import map_coordinates

    img2 = map_coordinates(base, [ys + dy, xs + dx], order=1, mode="nearest")

    rng = np.random.default_rng(4)
    pts = np.stack(
        [rng.uniform(40, 280, size=(24,)), rng.uniform(40, 200, size=(24,))], -1
    )
    out, status = klt.track_features(
        jnp.asarray(base, jnp.float32),
        jnp.asarray(img2, jnp.float32),
        jnp.asarray(pts, jnp.float32),
        jnp.asarray(pts, jnp.float32),  # no initial-flow prediction
        jnp.ones((24,), bool),
        window_size=21,
        max_level=3,
    )
    out = np.asarray(out)
    ok = np.asarray(status)
    assert ok.sum() >= 16
    err = np.linalg.norm(out[ok] - (pts[ok] - np.array([dx, dy])), axis=1)
    assert np.median(err) < 0.5, f"median err {np.median(err):.2f}px"


def test_klt_uses_initial_flow():
    base = _render_texture(240, 320, seed=5)
    dx, dy = 18.0, 11.0  # large shift: needs the prediction
    ys, xs = np.mgrid[0:240, 0:320].astype(np.float64)
    from scipy.ndimage import map_coordinates

    img2 = map_coordinates(base, [ys + dy, xs + dx], order=1, mode="nearest")
    rng = np.random.default_rng(6)
    pts = np.stack(
        [rng.uniform(60, 260, size=(16,)), rng.uniform(60, 180, size=(16,))], -1
    )
    pred = pts - np.array([dx, dy]) + rng.normal(size=pts.shape) * 0.5
    out, status = klt.track_features(
        jnp.asarray(base, jnp.float32),
        jnp.asarray(img2, jnp.float32),
        jnp.asarray(pts, jnp.float32),
        jnp.asarray(pred, jnp.float32),
        jnp.ones((16,), bool),
        window_size=21,
        max_level=2,
    )
    out = np.asarray(out)
    ok = np.asarray(status)
    assert ok.sum() >= 10
    err = np.linalg.norm(out[ok] - (pts[ok] - np.array([dx, dy])), axis=1)
    assert np.median(err) < 0.7


def test_klt_rejects_flat_regions():
    flat = np.full((120, 160), 100.0)
    pts = np.array([[50.0, 50.0], [90.0, 70.0]])
    out, status = klt.track_features(
        jnp.asarray(flat, jnp.float32),
        jnp.asarray(flat, jnp.float32),
        jnp.asarray(pts, jnp.float32),
        jnp.asarray(pts, jnp.float32),
        jnp.ones((2,), bool),
        window_size=21,
        max_level=1,
    )
    assert not bool(jnp.any(status))


# ---------- RANSAC ----------

def test_two_point_ransac_finds_outliers():
    rng = np.random.default_rng(7)
    n = 40
    # camera translation t with identity rotation; points at depth z
    t = np.array([0.2, 0.05, 0.0])
    z = rng.uniform(2, 8, n)
    p1 = rng.uniform(-0.4, 0.4, size=(n, 2))
    pw = np.concatenate([p1 * z[:, None], z[:, None]], axis=1)
    p2 = (pw - t)[:, :2] / (pw[:, 2:3] - t[2])
    outliers = rng.choice(n, 6, replace=False)
    p2_noisy = p2.copy()
    p2_noisy[outliers] += rng.uniform(0.05, 0.1, size=(6, 2)) * rng.choice([-1, 1], (6, 2))

    inl = ransac.two_point_ransac(
        jnp.eye(3, dtype=jnp.float32),
        jnp.asarray(p1, jnp.float32),
        jnp.asarray(p2_noisy, jnp.float32),
        jnp.ones((n,), bool),
        jax.random.PRNGKey(0),
        threshold=1e-6,
    )
    inl = np.asarray(inl)
    assert inl.sum() >= n - 8
    assert not inl[outliers].any()
