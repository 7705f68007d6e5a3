"""Synthetic image rendering for front-end-in-the-loop testing.

Renders each camera frame of a SyntheticWorld as point-like bright dots
(trackable by FAST + KLT as stable corners) over a low-texture background —
the image-domain counterpart of the feature-level synthetic generator, used
to exercise the FULL pipeline: pixels -> TrackHandler -> filter
(BASELINE.md config 4 shape, without dataset files).
"""

from __future__ import annotations

import numpy as np

from msckf_mono_tpu.data.synthetic import SyntheticWorld, _quat_mul_np, _quat_rotmat_np
from msckf_mono_tpu.utils.config import MsckfConfig


def project_frame(config: MsckfConfig, world: SyntheticWorld, frame: int):
    """Pixel positions (with distortion) + visibility of all landmarks."""
    from msckf_mono_tpu.frontend import undistort
    import jax.numpy as jnp

    cam = config.camera
    k = world.frame_idx[frame]
    q_IG = world.q_seq[k]
    p_I_G = world.p_seq[k]
    q_CG = _quat_mul_np(np.asarray(cam.q_CI), q_IG)
    R_CG = _quat_rotmat_np(q_CG)
    R_IG = _quat_rotmat_np(q_IG)
    p_C_G = p_I_G + R_IG.T @ np.asarray(cam.p_C_I)

    rel = world.landmarks - p_C_G[None, :]
    p_f_C = rel @ R_CG.T
    z = p_f_C[:, 2]
    safe_z = np.where(np.abs(z) < 1e-9, 1e-9, z)
    xy = p_f_C[:, :2] / safe_z[:, None]

    xy_d = np.asarray(undistort.distort_radtan(jnp.asarray(xy), cam.distortion_coeffs))
    u = xy_d[:, 0] * cam.f_u + cam.c_u
    v = xy_d[:, 1] * cam.f_v + cam.c_v
    margin = 8
    visible = (
        (z > 0.5)
        & (z < 40.0)
        & (u >= margin)
        & (u < cam.width - margin)
        & (v >= margin)
        & (v < cam.height - margin)
    )
    return np.stack([u, v], -1), visible


def render_frame(config: MsckfConfig, world: SyntheticWorld, frame: int, seed: int = 0):
    """(H, W) float32 image: bright dots at visible landmark projections."""
    cam = config.camera
    rng = np.random.default_rng(seed + frame * 7919)
    img = np.full((cam.height, cam.width), 40.0) + rng.normal(
        size=(cam.height, cam.width)
    )

    uv, visible = project_frame(config, world, frame)
    yy, xx = np.mgrid[0:7, 0:7].astype(np.float64)
    for u, v in uv[visible]:
        ui, vi = int(np.floor(u)), int(np.floor(v))
        y0, x0 = vi - 3, ui - 3
        # evaluate the Gaussian at the TRUE subpixel center so the rendered
        # dot moves continuously with the projection
        du = u - x0
        dv = v - y0
        kernel = 190.0 * np.exp(-(((xx - du) ** 2) + (yy - dv) ** 2) / 2.2)
        img[y0 : y0 + 7, x0 : x0 + 7] += kernel
    return np.clip(img, 0, 255).astype(np.float32)
