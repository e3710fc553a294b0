"""Round-4 plan sweep 2: stage-0 shapes for the event loops.

Hypotheses from the cost model (fine take ~126M lookups/s, event-take
volume = segment x capacity x iterations):
  - RATIO stage 0 runs DENSE over the concatenated shadow batch; the
    upfront exp(-ctot) Russian roulette parks a large fraction of lanes
    before any event, so a compacted stage 0 should cut the take volume.
  - S=4 sub-segments in stage 0 let the any-unresolved early exit stop
    after 4/8/12 events instead of always burning 8/16 per lane.

Run: python experiments/plan_sweep2.py
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
    print(f"{name:52s} {dt:9.1f} ms   (compile {tc:.0f}s)", flush=True)
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

    variants = [
        ("base r=dense8 d=.30x8", tr.RATIO_PLAN, tr.DELTA_PLAN),
        ("ratio cap.5x8", ((0.5, 8, 16), (0.08, 16, None)), tr.DELTA_PLAN),
        ("ratio cap.4x4", ((0.4, 4, 16), (0.08, 16, None)), tr.DELTA_PLAN),
        ("delta S4", tr.RATIO_PLAN, ((0.30, 4, 16), (0.10, 16, None))),
        ("ratio cap.4x4 + delta S4",
         ((0.4, 4, 16), (0.08, 16, None)),
         ((0.30, 4, 16), (0.10, 16, None))),
    ]
    for name, rp, dp in variants:
        tr.RATIO_PLAN, tr.DELTA_PLAN = rp, dp

        # fresh closures per variant: jax.jit caches on function identity,
        # so a shared closure would silently reuse the first variant's
        # compilation (the plans are read at trace time)
        def gen(s, o, d):
            return trace_primary(s, vol, lights, p_prim, o, d, cfg)

        def train(s, o, d):
            return trace_fixed(s, vol, lights, params, o, d,
                               cfg.train_ray_length)

        timeit(f"gen   {name}", gen, flat_state, flat_ro, flat_rd)
        timeit(f"train {name}", train, t_state, t_ro, t_rd)


if __name__ == "__main__":
    main()
