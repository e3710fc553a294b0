"""Round-4 progress measurement: tracing stages under the adopted design
(kernel profile totals, retuned plans, per-site TraceParams).

Baselines (round 3 design, same protocol): delta@2.07M 531 ms,
gen 1886 ms, train 749 ms.

Run: python experiments/measure_r4.py
"""
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "..")

import jax
import jax.numpy as jnp

from nrc_hpm_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()

import numpy as np

from nrc_hpm_tpu.camera import Camera, pixel_rays
from nrc_hpm_tpu.config import AppConfig
from nrc_hpm_tpu.integrator import TraceParams, trace_fixed, trace_primary
from nrc_hpm_tpu.lights import LightFlags, lights_from_scene
from nrc_hpm_tpu.renderer import _volume_from_config
from nrc_hpm_tpu.transmittance import delta_track_pw, ratio_track_pw
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
    print(f"{name:24s} {dt:9.1f} ms   (compile {tc:.0f}s)", flush=True)
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

    params = TraceParams(flags=flags, max_track_steps=cfg.max_track_steps)
    p_prim = params.primary_params()

    def f_delta(s, o, d):
        return delta_track_pw(s, vol, o, d, cfg.max_track_steps)
    timeit("delta@2.07M", f_delta, flat_state, flat_ro, flat_rd)

    cap = int(0.24 * n_pix)
    sh_start = jnp.tile(flat_ro[:cap], (3, 1))
    sh_end = sh_start + 80.0 * jnp.tile(flat_rd[:cap], (3, 1))
    sh_state = jnp.tile(flat_state[:cap], (3,))

    def f_ratio(s, a, b):
        return ratio_track_pw(s, vol, a, b, cfg.max_track_steps)
    timeit("ratio@3x498k", f_ratio, sh_state, sh_start, sh_end)

    def f_gen(s, o, d):
        return trace_primary(s, vol, lights, p_prim, o, d, cfg)
    timeit("gen (primary params)", f_gen, flat_state, flat_ro, flat_rd)

    tw, th, _, _ = cfg.train_subset()
    tx = jnp.arange(tw, dtype=jnp.float32) / W
    ty = jnp.arange(th, dtype=jnp.float32) / H
    tu, tv = jnp.meshgrid(tx, ty, indexing="xy")
    t_state = rng.init_state(jnp.stack([tu, tv], -1).reshape(-1, 2),
                             jnp.array([0.1, 0.2, 0.3, 0.4]))
    rs = np.random.RandomState(0)
    t_ro = jnp.asarray(rs.uniform(-20, 20, (tw * th, 3)).astype(np.float32))
    t_rd_np = rs.normal(size=(tw * th, 3)).astype(np.float32)
    t_rd = jnp.asarray(t_rd_np / np.linalg.norm(t_rd_np, axis=-1,
                                                keepdims=True))

    def f_train(s, o, d):
        return trace_fixed(s, vol, lights, params, o, d,
                           cfg.train_ray_length)
    timeit("train (default params)", f_train, t_state, t_ro, t_rd)


if __name__ == "__main__":
    main()
