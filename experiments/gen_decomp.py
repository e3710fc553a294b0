"""Decompose the 1080p gen_rays stage (68% of the tpu_tuned frame).

Wall timings that rely on the serial device queue plus a final
data-dependent scalar fetch (the fetch cannot complete until every queued
dispatch ran, so the axon tunnel's early block_until_ready ack cannot
hide device time) of:

  full        trace_primary, scene-4 lights (dir 8 + env 0.1)
  nolight     trace_primary, all light flags off (delta tracking only)
  delta_pw    one standalone piecewise delta_track over the 2.07M
              primary rays (the first bounce's call)
  ratio_pw    one standalone piecewise ratio_track over a scene-phase
              shadow batch (cap = scene_compact_frac * N lanes, 2 segs)
  pw_events   one bare event-kernel call (profile+draws+inversion, no
              fine gather) at the delta call's lane count
  fine_take   one fine-grid take of an (8, N) index block (the gather
              that stays in XLA), random indices

Run on the real TPU: python experiments/gen_decomp.py
"""
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "..")

import jax
import jax.numpy as jnp
import numpy as np

from nrc_hpm_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()

from nrc_hpm_tpu.camera import Camera, pixel_rays
from nrc_hpm_tpu.config import AppConfig
from nrc_hpm_tpu.integrator import TraceParams, trace_primary
from nrc_hpm_tpu.lights import LightFlags, lights_from_scene
from nrc_hpm_tpu.renderer import _volume_from_config
from nrc_hpm_tpu.transmittance import delta_track_pw, ratio_track_pw
from nrc_hpm_tpu.utils import rng


def timeit(name, fn, *args, n=4):
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    # force real completion: fetch a data-dependent scalar
    leaves = jax.tree.leaves(out)
    float(jnp.asarray(leaves[0]).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    leaves = jax.tree.leaves(out)
    float(jnp.asarray(leaves[0]).ravel()[0])
    dt = (time.perf_counter() - t0) / n * 1000.0
    print(f"{name:12s} {dt:9.1f} ms", flush=True)
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

    p_full = TraceParams(flags=LightFlags.from_scene(cfg.scene),
                         max_track_steps=cfg.max_track_steps)
    p_none = TraceParams(flags=LightFlags(False, False, False),
                         max_track_steps=cfg.max_track_steps)

    def run(p):
        def f(s, o, d):
            return trace_primary(s, vol, lights, p, o, d, cfg)
        return f

    timeit("full", run(p_full), flat_state, flat_ro, flat_rd)
    timeit("nolight", run(p_none), flat_state, flat_ro, flat_rd)

    def f_delta(s, o, d):
        return delta_track_pw(s, vol, o, d, cfg.max_track_steps)
    timeit("delta_pw", f_delta, flat_state, flat_ro, flat_rd)

    # scene-phase shadow batch: 2 concatenated segments at the compacted cap
    cap = int(p_full.scene_compact_frac * n_pix)
    cap2 = 2 * cap
    sh_start = jnp.tile(flat_ro[:cap], (2, 1))
    # shadow segments point toward the volume exit; reuse primary dirs
    sh_end = sh_start + 80.0 * jnp.tile(flat_rd[:cap], (2, 1))
    sh_state = jnp.tile(flat_state[:cap], (2,))

    def f_ratio(s, a, b):
        return ratio_track_pw(s, vol, a, b, cfg.max_track_steps)
    timeit("ratio_pw", f_ratio, sh_state, sh_start, sh_end)

    # bare event kernel at the primary delta's lane count
    from nrc_hpm_tpu.ops.pw_kernels import pw_events
    tmax = jnp.full((n_pix,), 80.0)
    seed = jax.lax.bitcast_convert_type(flat_state, jnp.uint32)
    e_last = jnp.zeros((n_pix,))

    def f_events(seed, e_last):
        return pw_events(vol, flat_ro, flat_rd, tmax, seed, e_last,
                         jnp.int32(0), S=8)
    timeit("pw_events", f_events, seed, e_last)

    # the fine-grid take the event loop performs per segment
    grid_flat = vol.grid.reshape(-1)
    key = jax.random.PRNGKey(0)
    idx = jax.random.randint(key, (8, n_pix), 0, grid_flat.shape[0])

    def f_take(idx):
        return jnp.take(grid_flat, idx, mode="fill", fill_value=0)
    dt = timeit("fine_take", f_take, idx)
    print(f"fine_take rate: {8 * n_pix / dt / 1e3:.0f}M lookups/s")


if __name__ == "__main__":
    main()
