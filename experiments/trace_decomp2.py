"""Round-4: decompose trace_path overhead beyond the raw delta tracks.

gen_decomp (round 3) showed nolight trace_primary = 1460 ms while ONE
dense delta_track_pw at 2.07M lanes = 528 ms.  Where do the other ~900 ms
go?  Time, feedback-chained on the real TPU:

  delta@N        standalone delta_track_pw at several lane counts
  path1          trace_path n_bounces=1, no lights (delta + dir sample)
  path2          trace_path n_bounces=2, no lights (the gen_rays shape)
  path2_nocmp    same with bounce/scene compaction disabled
  path2_noevcmp  same with event-loop compaction also disabled
  nonzero        bare jnp.nonzero at 2.07M lanes (compaction cost floor)
  newdir         new_ray_dir at 830k lanes

Run: python experiments/trace_decomp2.py
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

from nrc_hpm_tpu.camera import Camera, pixel_rays
from nrc_hpm_tpu.config import AppConfig
from nrc_hpm_tpu.integrator import TraceParams, trace_path
from nrc_hpm_tpu.lights import LightFlags, lights_from_scene
from nrc_hpm_tpu.renderer import _volume_from_config
from nrc_hpm_tpu.sampling import new_ray_dir
from nrc_hpm_tpu.transmittance import delta_track_pw
from nrc_hpm_tpu.utils import rng


def timeit(name, fn, *args, n=4):
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    leaves = jax.tree.leaves(out)
    float(jnp.asarray(leaves[0]).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    leaves = jax.tree.leaves(out)
    float(jnp.asarray(leaves[0]).ravel()[0])
    dt = (time.perf_counter() - t0) / n * 1000.0
    print(f"{name:16s} {dt:9.1f} ms", flush=True)
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

    p_none = TraceParams(flags=LightFlags(False, False, False),
                         max_track_steps=cfg.max_track_steps)
    p_nocmp = dataclasses.replace(p_none, bounce_compact_frac=0.0,
                                  scene_compact_frac=0.0)
    p_noev = dataclasses.replace(p_nocmp, event_compact=False)

    for n in (n_pix, n_pix // 2, int(n_pix * 0.4), n_pix // 8):
        def f_delta(s, o, d):
            return delta_track_pw(s, vol, o, d, cfg.max_track_steps)
        timeit(f"delta@{n}", f_delta, flat_state[:n], flat_ro[:n],
               flat_rd[:n])

    def mk_path(p, nb):
        def f(s, o, d):
            return trace_path(s, vol, lights, p, o, d, n_bounces=nb,
                              primary_ray_length=1, primary_ray_prob=0.0)
        return f

    timeit("path1", mk_path(p_none, 1), flat_state, flat_ro, flat_rd)
    timeit("path2", mk_path(p_none, 2), flat_state, flat_ro, flat_rd)
    timeit("path2_nocmp", mk_path(p_nocmp, 2), flat_state, flat_ro, flat_rd)
    timeit("path2_noevcmp", mk_path(p_noev, 2), flat_state, flat_ro,
           flat_rd)

    mask = flat_rd[:, 0] > 0.0

    def f_nz(m):
        idx, = jnp.nonzero(m, size=int(n_pix * 0.4), fill_value=n_pix)
        return idx
    timeit("nonzero", f_nz, mask)

    n8 = int(n_pix * 0.4)

    def f_dir(s, d):
        return new_ray_dir(s, d, vol.g, phase_sampling=True)
    timeit("newdir", f_dir, flat_state[:n8], flat_rd[:n8])


if __name__ == "__main__":
    main()
