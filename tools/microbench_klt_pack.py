"""Measure KLT kernel time vs feature packing (ops/klt_pallas.PACK).

Shared-camera shape: (B, F) points, one (1, H, W) image pair per level, all
pyramid levels timed together inside one scanned loop (host per-call timing
on the tunnel measures dispatch floor). Run serially on the TPU.
"""
import os, sys, time
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
import jax
jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp, numpy as np
from msckf_mono_tpu.data import render, synthetic
from msckf_mono_tpu.frontend import klt
from msckf_mono_tpu.ops import klt_pallas
from msckf_mono_tpu.utils.config import MsckfConfig

B, F, ITERS = 256, 64, 20
cfg = MsckfConfig()
seq, world = synthetic.generate(cfg, n_frames=3, seed=0, pixel_noise=0.0,
                                n_landmarks=500, return_world=True)
img0 = jnp.asarray(render.render_frame(cfg, world, 0), jnp.float32)
img1 = jnp.asarray(render.render_frame(cfg, world, 1), jnp.float32)
uv0, vis0 = render.project_frame(cfg, world, 0)
idx = np.nonzero(vis0)[0][:F]
pts1 = np.asarray(uv0[idx], np.float32)
rng = np.random.default_rng(0)
pts = jnp.asarray(pts1[None] + rng.normal(size=(B, F, 2)) * 2.0, jnp.float32)
valid = jnp.ones((B, F), bool)
pyr0 = klt.build_pyramid(img0, 3)
pyr1 = klt.build_pyramid(img1, 3)

for pack in (2, 4, 8, 16):
    klt_pallas.PACK = pack
    jax.clear_caches()

    @jax.jit
    def loop(pts):
        def body(p, _):
            out = p
            for lv in range(3, -1, -1):
                s = 2.0 ** lv
                o, g = jax.vmap(
                    lambda pp, vv: klt_pallas.track_level(
                        pyr0[lv], pyr1[lv], pp / s, pp / s, vv,
                        window_size=21, max_iters=30, eps=1.0)
                )(out, valid)
                out = jnp.where(g[..., None], o * s, out)
            # feed original pts back so positions stay in-image
            return pts + 1e-30 * out, None

        p, _ = jax.lax.scan(body, pts, None, length=ITERS)
        return p

    t0 = time.perf_counter()
    r = loop(pts); jax.block_until_ready(r)
    np.asarray(jax.device_get(r[:1, :1]))
    comp = time.perf_counter() - t0
    t0 = time.perf_counter()
    r = loop(pts); jax.block_until_ready(r)
    np.asarray(jax.device_get(r[:1, :1]))
    dt = (time.perf_counter() - t0) / ITERS
    print(f"pack={pack:2d}: {dt*1e3:8.2f} ms per 4-level track of (256,64) pts "
          f"(compile {comp:.0f}s)", flush=True)
