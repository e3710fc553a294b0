"""Round-4 sweep: gen_rays / prep_train cost vs compaction + plan knobs.

trace_decomp2 measured (1080p, TPU v5e):
  - trace_path's per-bounce LANE compaction is a net LOSS without lights
    (path2 1453 ms vs path2_nocmp 1021 ms): the row gathers/scatters it
    issues run on the same ~126M elem/s scalar path as the fine take.
  - delta_track_pw cost is linear in lane count (~256 ms/M), so every
    static capacity that exceeds the live-lane count burns real time.

This sweep times the PRODUCTION gen_rays shape (trace_primary at 2.07M
lanes, scene-4 lights) and the prep_train shape (65,536 lanes x 32
bounces) across:
  - bounce_compact_frac x scene_compact_frac
  - DELTA_PLAN stage-0 capacity (0.55 vs 0.30: primary rays hit the box
    at only ~27%, so the 0.55 cap doubles every stage-0 event cost)
  - tail segment length (8 vs 16: fewer while iterations on the
    unresolved tail)

Run: python experiments/gen_variants.py
"""
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "..")

import jax
import jax.numpy as jnp

from nrc_hpm_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()

import dataclasses

import nrc_hpm_tpu.transmittance as tr
from nrc_hpm_tpu.camera import Camera, pixel_rays
from nrc_hpm_tpu.config import AppConfig
from nrc_hpm_tpu.integrator import TraceParams, trace_fixed, trace_primary
from nrc_hpm_tpu.lights import LightFlags, lights_from_scene
from nrc_hpm_tpu.renderer import _volume_from_config
from nrc_hpm_tpu.utils import rng


def timeit(name, fn, *args, n=3):
    f = jax.jit(fn)
    t0 = time.perf_counter()
    out = f(*args)
    jax.block_until_ready(out)
    leaves = jax.tree.leaves(out)
    float(jnp.asarray(leaves[0]).ravel()[0])
    tc = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    leaves = jax.tree.leaves(out)
    float(jnp.asarray(leaves[0]).ravel()[0])
    dt = (time.perf_counter() - t0) / n * 1000.0
    print(f"{name:44s} {dt:9.1f} ms   (compile {tc:.0f}s)", flush=True)
    return dt


def main():
    cfg = AppConfig.tpu_tuned()
    W, H = cfg.render_width, cfg.render_height
    vol = _volume_from_config(cfg)
    lights = lights_from_scene(cfg.scene)
    cam = Camera.reference_camera(aspect=W / H)
    ro, rd, frag_uv = pixel_rays(cam, W, H)
    state = rng.init_state(frag_uv, jnp.array([0.1, 0.2, 0.3, 0.4]))
    n_pix = W * H
    flat_rd = rd.reshape(n_pix, 3)
    flat_ro = jnp.broadcast_to(ro, flat_rd.shape)
    flat_state = state.reshape(n_pix)
    flags = LightFlags.from_scene(cfg.scene)

    # train-ray inputs: 65,536 start points inside the cloud-ish region
    tw, th, xd, yd = cfg.train_subset()
    tx = jnp.arange(tw, dtype=jnp.float32) / W
    ty = jnp.arange(th, dtype=jnp.float32) / H
    tu, tv = jnp.meshgrid(tx, ty, indexing="xy")
    t_state = rng.init_state(jnp.stack([tu, tv], -1).reshape(-1, 2),
                             jnp.array([0.1, 0.2, 0.3, 0.4]))
    import numpy as np
    rs = np.random.RandomState(0)
    t_ro = jnp.asarray(rs.uniform(-20, 20, (tw * th, 3)).astype(np.float32))
    t_rd_np = rs.normal(size=(tw * th, 3)).astype(np.float32)
    t_rd = jnp.asarray(t_rd_np / np.linalg.norm(t_rd_np, axis=-1,
                                                keepdims=True))

    def gen(p):
        def f(s, o, d):
            return trace_primary(s, vol, lights, p, o, d, cfg)
        return f

    def train(p):
        def f(s, o, d):
            return trace_fixed(s, vol, lights, p, o, d,
                               cfg.train_ray_length)
        return f

    variants = [
        ("base b=.40 s=.28 d0=.55 tail8", dict(), 0.55, 8),
        ("nobounce b=0 s=.28", dict(bounce_compact_frac=0.0), 0.55, 8),
        ("nobounce d0=.30", dict(bounce_compact_frac=0.0), 0.30, 8),
        ("nobounce d0=.30 tail16", dict(bounce_compact_frac=0.0), 0.30, 16),
        ("nocmp b=0 s=0 d0=.30", dict(bounce_compact_frac=0.0,
                                      scene_compact_frac=0.0), 0.30, 8),
        ("nobounce s=.24 d0=.30 tail16",
         dict(bounce_compact_frac=0.0, scene_compact_frac=0.24), 0.30, 16),
    ]

    base_delta = tr.DELTA_PLAN
    base_ratio = tr.RATIO_PLAN
    for name, pkw, d0, tail in variants:
        tr.DELTA_PLAN = ((d0, 8, 16), (0.10, tail, None))
        tr.RATIO_PLAN = ((None, 8, 16), (0.08, tail, None))
        p = TraceParams(flags=flags, max_track_steps=cfg.max_track_steps,
                        **pkw)
        timeit(f"gen   {name}", gen(p), flat_state, flat_ro, flat_rd)
        timeit(f"train {name}", train(p), t_state, t_ro, t_rd)
    tr.DELTA_PLAN = base_delta
    tr.RATIO_PLAN = base_ratio


if __name__ == "__main__":
    main()
