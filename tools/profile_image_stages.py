"""Per-stage device timing of the IMAGE pipeline (shared-camera mode).

Decomposes core/pipeline.step at batch B into isolated jitted stages, each
iterated inside one lax.scan (host-side per-call timing on the tunneled TPU
measures mostly the ~0.7 s dispatch floor — see eval/timing.py):

  pyramid   build_pyramid of one shared image (image-only, hoisted 1x)
  klt       all pyramid levels of Pallas LK for (B, F) points
  detect    FAST+Shi-Tomasi+tile-reduction (image-only) + per-filter masking
  undistort tracked+new undistortion, budgeting, grid dedup (per-filter)
  filter    the full filter frame step (the track-level pipeline)

Usage (serial on the TPU): python tools/profile_image_stages.py [--batch 256]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--iters", type=int, default=100)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--independent", action="store_true",
                    help="per-stream front-end: every stage sees B DIFFERENT "
                         "images (the ros_interface.cpp:48-120 shape) instead "
                         "of one shared camera — isolates what stops batching "
                         "across streams (VERDICT r4 item 5)")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from msckf_mono_tpu.core import pipeline
    from msckf_mono_tpu.core.init import ground_truth_init
    from msckf_mono_tpu.data import render, synthetic
    from msckf_mono_tpu.frontend import detect, functional, klt, undistort
    from msckf_mono_tpu.parallel import montecarlo
    from msckf_mono_tpu.utils.config import MsckfConfig

    B = args.batch
    cfg = MsckfConfig()
    fcfg = functional.FrontendConfig(
        max_features=64, window_size=21, max_level=3,
        image_precision=os.environ.get("MSCKF_IMAGE_PRECISION", "default"),
    )
    H, W = cfg.camera.height, cfg.camera.width
    log(f"device={jax.devices()[0]} batch={B} win={fcfg.window_size} "
        f"levels={fcfg.max_level + 1}")

    # ---- build a realistic mid-sequence state by running the real pipeline
    T_warm = 25
    seq, world = synthetic.generate(
        cfg, n_frames=T_warm, seed=0, pixel_noise=0.0, n_landmarks=500,
        return_world=True,
    )
    imgs = np.stack([render.render_frame(cfg, world, i) for i in range(T_warm)])
    imu = ground_truth_init(
        p_I_G=[5.0, 0.0, 0.0], q_IG=[1, 0, 0, 0],
        v_I_G=[0.0, 5.0 * 0.35, 0.2 * 1.4], b_g=seq.b_g, b_a=seq.b_a,
        dtype=jnp.float32,
    )
    states = jax.jit(
        lambda k: montecarlo.make_fleet(cfg, imu, B, key=k, dtype=jnp.float32)
    )(jax.random.PRNGKey(0))
    fstate = functional.init_frontend_state(H, W, fcfg)
    fstates = jax.jit(
        lambda f: jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x, (B,) + x.shape), f)
    )(fstate)

    imgs_d = jnp.asarray(np.asarray(imgs, np.float32))
    om = jnp.asarray(np.asarray(seq.imu_omega, np.float32))
    ac = jnp.asarray(np.asarray(seq.imu_acc, np.float32))
    dt_ = jnp.asarray(np.asarray(seq.imu_dt, np.float32))
    tm = jnp.asarray(np.asarray(seq.time, np.float32))
    sid = jnp.arange(1, T_warm + 1, dtype=jnp.int32)

    run = pipeline.batched_run_images_shared(cfg, fcfg)

    @jax.jit
    def warm(states, fstates):
        frames = pipeline.ImageFrameInput(
            image=imgs_d,
            imu_omega=jnp.broadcast_to(om[:, None], (T_warm, B) + om.shape[1:]),
            imu_acc=jnp.broadcast_to(ac[:, None], (T_warm, B) + ac.shape[1:]),
            imu_dt=jnp.broadcast_to(dt_[:, None], (T_warm, B) + dt_.shape[1:]),
            state_id=jnp.broadcast_to(sid[:, None], (T_warm, B)),
            time=jnp.broadcast_to(tm[:, None], (T_warm, B)),
            frame_valid=jnp.ones((T_warm, B), bool),
        )
        return run(states, fstates, frames)

    log("warming to a mid-sequence state...")
    t0 = time.perf_counter()
    states, fstates, _ = warm(states, fstates)
    jax.block_until_ready(states.P)
    np.asarray(jax.device_get(states.imu.q_IG[:1]))
    log(f"warm done in {time.perf_counter() - t0:.1f}s")

    img_prev = imgs_d[-2]
    img_cur = imgs_d[-1]
    dtype = jnp.float32
    if args.independent:
        # B DIFFERENT images: tile the warm frames cyclically + a per-stream
        # brightness jitter so no two streams are bit-identical
        idx = jnp.arange(B) % (T_warm - 1)
        jit_b = (jnp.arange(B, dtype=jnp.float32)[:, None, None] % 7.0) * 0.5
        imgs_prev_b = imgs_d[idx] + jit_b
        imgs_cur_b = imgs_d[idx + 1] + jit_b

    # ---- stage fns; MARGINAL per-iteration cost from two scan lengths ----
    # The tunneled TPU adds a 25-70 ms (sporadically multi-second) per-CALL
    # dispatch overhead, so a single fixed-length scan conflates call
    # overhead with stage cost (round 5: the same pyramid program measured
    # 3 ms/iter and 139 "ms/iter" minutes apart). (min_wall(L2) -
    # min_wall(L1)) / (L2 - L1) over a few reps cancels any constant
    # per-call term and rides out degraded-tunnel windows.
    L1, L2 = max(args.iters // 4, 5), args.iters

    def timed(name, fn, *xs):
        def mk(length):
            @jax.jit
            def loop(*xs):
                # outputs thread back in as the carry (stage fns return
                # tuples structured like their inputs) so the scan body
                # can't be hoisted
                def body(c, _):
                    return fn(*c), None

                c, _ = jax.lax.scan(body, xs, None, length=length)
                return c

            return loop

        walls = {}
        compile_s = 0.0
        for length in (L1, L2):
            loop = mk(length)
            t0 = time.perf_counter()
            r = loop(*xs)
            jax.block_until_ready(r)
            np.asarray(jax.device_get(jax.tree_util.tree_leaves(r)[0]).ravel()[:1])
            compile_s += time.perf_counter() - t0
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                r = loop(*xs)
                jax.block_until_ready(r)
                np.asarray(jax.device_get(
                    jax.tree_util.tree_leaves(r)[0]).ravel()[:1])
                best = min(best, time.perf_counter() - t0)
            walls[length] = best
        dt = (walls[L2] - walls[L1]) / (L2 - L1)
        log(f"  {name:12s} {dt * 1e3:9.2f} ms/frame-batch  "
            f"(marginal over {L2}-{L1} iters; compile {compile_s:.0f}s)")
        return dt

    results = {}

    # pyramid: shared mode builds ONE image's pyramid per frame; independent
    # mode builds B of them
    if args.independent:
        results["pyramid"] = timed(
            "pyramid",
            lambda imgs: (imgs + 1e-30 * jnp.sum(jax.vmap(
                lambda im: klt.build_pyramid(im, fcfg.max_level,
                    precision=fcfg.image_precision)[-1])(imgs)),),
            imgs_cur_b,
        )
    else:
        results["pyramid"] = timed(
            "pyramid",
            lambda img: (img + 1e-30 * jnp.sum(klt.build_pyramid(
                img, fcfg.max_level, precision=fcfg.image_precision)[-1]),),
            img_cur,
        )

    # KLT all levels (B, F)
    pts = fstates.pts
    valid = fstates.valid

    if args.independent:
        # images travel IN THE CARRY (perturbed by the output) — closed-over
        # images let XLA hoist the whole per-stream pyramid+track out of the
        # timing scan (measured round 5: 22.5 ms "klt" vs 163 ms for the
        # pyramid work it silently excluded)
        def klt_all(ims_p, ims_c, pts, valid):
            def one(im_p, im_c, pp, vv):
                pyr_p = klt.build_pyramid(im_p, fcfg.max_level,
                                          precision=fcfg.image_precision)
                pyr_c = klt.build_pyramid(im_c, fcfg.max_level,
                                          precision=fcfg.image_precision)
                return klt.track_features_pyr(
                    pyr_p, pyr_c, pp, pp, vv,
                    window_size=fcfg.window_size, max_iters=fcfg.max_iters,
                )
            p, s = jax.vmap(one)(ims_p, ims_c, pts, valid)
            eps = 1e-30 * p[0, 0, 0]
            return ims_p + eps, ims_c + eps, pts, valid

        results["klt(+pyr)"] = timed(
            "klt(+pyr)", klt_all, imgs_prev_b, imgs_cur_b, pts, valid)
    else:
        # the shared pyramids are built once per FRAME in the real pipeline,
        # so they must be inside the timed body too — carry the images
        def klt_all(im_p, im_c, pts, valid):
            pyr_prev = klt.build_pyramid(im_p, fcfg.max_level,
                                         precision=fcfg.image_precision)
            pyr_cur = klt.build_pyramid(im_c, fcfg.max_level,
                                        precision=fcfg.image_precision)
            p, s = jax.vmap(
                lambda pp, vv: klt.track_features_pyr(
                    pyr_prev, pyr_cur, pp, pp, vv,
                    window_size=fcfg.window_size, max_iters=fcfg.max_iters,
                )
            )(pts, valid)
            # feed the ORIGINAL pts back (plus an un-DCE-able trace of p) so
            # the tracked points don't drift across iterations
            eps = 1e-30 * p[0, 0, 0]
            return im_p + eps, im_c + eps, pts + 1e-30 * p, valid

        results["klt(+pyr)"] = timed("klt(+pyr)", klt_all, img_prev, img_cur,
                                     pts, valid)

    # detection (image score+reduction, per-filter occupancy mask)
    occ = jnp.zeros((B, fcfg.n_grid_rows * fcfg.n_grid_cols), bool)

    if args.independent:
        def det(ims, occ):
            xy, sc, v = jax.vmap(
                lambda im, o: detect.detect_features(
                    im, o, fcfg.n_grid_rows, fcfg.n_grid_cols,
                    fcfg.fast_threshold, fcfg.detection_threshold,
                    st_precision=fcfg.image_precision,
                )
            )(ims, occ)
            return ims + 1e-30 * sc[0, 0], occ ^ (v[:, : occ.shape[1]] & occ)

        results["detect"] = timed("detect", det, imgs_cur_b, occ)
    else:
        def det(im, occ):
            xy, sc, v = jax.vmap(
                lambda o: detect.detect_features(
                    im, o, fcfg.n_grid_rows, fcfg.n_grid_cols,
                    fcfg.fast_threshold, fcfg.detection_threshold,
                    st_precision=fcfg.image_precision,
                )
            )(occ)
            return im + 1e-30 * sc[0, 0], occ ^ (v[:, : occ.shape[1]] & occ)

        results["detect"] = timed("detect", det, img_cur, occ)

    # undistort both feature sets (per filter)
    K = jnp.asarray([[cfg.camera.f_u, 0, cfg.camera.c_u],
                     [0, cfg.camera.f_v, cfg.camera.c_v], [0, 0, 1.0]], dtype)

    def undist(p):
        u = jax.vmap(lambda x: undistort.undistort_points(
            x, K, cfg.camera.distortion_coeffs))(p)
        return (p + u * 1e-30,)

    results["undistort"] = timed("undistort", undist, pts)

    # full fused image step (for the total); the image rides in the CARRY so
    # its per-frame pyramid/detect work cannot be hoisted out of the scan
    img_carry = imgs_cur_b if args.independent else img_cur

    def full(img_c, states, fstates):
        frames1 = pipeline.ImageFrameInput(
            image=img_c,
            imu_omega=jnp.broadcast_to(om[-1][None], (B,) + om.shape[1:]),
            imu_acc=jnp.broadcast_to(ac[-1][None], (B,) + ac.shape[1:]),
            imu_dt=jnp.broadcast_to(dt_[-1][None], (B,) + dt_.shape[1:]),
            state_id=jnp.broadcast_to(sid[-1][None], (B,)),
            time=jnp.broadcast_to(tm[-1][None], (B,)),
            frame_valid=jnp.ones((B,), bool),
        )
        s2, f2 = jax.vmap(
            lambda s, fs, f: pipeline.step((s, fs), f, cfg, fcfg)[0],
            in_axes=(0, 0, pipeline.ImageFrameInput(
                image=0 if args.independent else None,
                imu_omega=0, imu_acc=0, imu_dt=0,
                state_id=0, time=0, frame_valid=0)),
        )(states, fstates, frames1)
        return img_c + 1e-30 * s2.imu.p_I_G[0, 0], s2, f2

    results["full_step"] = timed("full_step", full, img_carry, states, fstates)

    total = results["full_step"]
    log(f"\nfull step {total * 1e3:.2f} ms => {B / total:.0f} img-frame-steps/s "
        f"at batch {B}")
    mode = "independent-streams" if args.independent else "shared-camera"
    lines = [f"# image-pipeline per-stage MARGINAL device times "
             f"(per-call tunnel overhead cancelled), batch={B}, {mode} "
             f"({time.strftime('%Y-%m-%d %H:%M:%S')})"]
    for k, v in results.items():
        lines.append(f"  {k:12s} {v * 1e3:9.2f} ms")
    if jax.default_backend() == "tpu":
        suffix = "_INDEP" if args.independent else ""
        with open(os.path.join(REPO, f"PROF_IMAGE_STAGES{suffix}.txt"), "w") as f:
            f.write("\n".join(lines) + "\n")
        log(f"wrote PROF_IMAGE_STAGES{suffix}.txt")


if __name__ == "__main__":
    main()
