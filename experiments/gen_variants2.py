"""Round-4 sweep part 2: chunked primary tracing + per-site TraceParams.

gen_variants measured: bounce compaction hurts gen (-0) but helps train
(+86 ms when removed); d0=0.30 + tail16 + s=0.24 takes gen 1886 -> 1665.
Remaining gen cost is cap-sized machinery on a ~27%-live lane set.

lax.map chunking (renderer._map_chunks) gives BLOCK-level adaptivity the
static caps cannot: chunks of rows outside the cloud silhouette resolve
instantly (their tracking while-loops see no unresolved lane and issue no
gathers), and every static capacity shrinks with the chunk.  Results are
bitwise identical (stateless per-lane RNG).

Run: python experiments/gen_variants2.py
"""
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "..")

import jax
import jax.numpy as jnp

from nrc_hpm_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()


import nrc_hpm_tpu.transmittance as tr
from nrc_hpm_tpu.camera import Camera, pixel_rays
from nrc_hpm_tpu.config import AppConfig
from nrc_hpm_tpu.integrator import TraceParams, trace_primary
from nrc_hpm_tpu.lights import LightFlags, lights_from_scene
from nrc_hpm_tpu.renderer import _map_chunks, _volume_from_config
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

    tr.DELTA_PLAN = ((0.30, 8, 16), (0.10, 16, None))
    tr.RATIO_PLAN = ((None, 8, 16), (0.08, 16, None))
    p = TraceParams(flags=flags, max_track_steps=cfg.max_track_steps,
                    bounce_compact_frac=0.0, scene_compact_frac=0.24)

    def gen(chunks):
        def f(s, o, d):
            return _map_chunks(
                lambda sc, oc, dc: trace_primary(sc, vol, lights, p, oc,
                                                 dc, cfg),
                chunks, s, o, d)
        return f

    for chunks in (1, 4, 8, 16):
        timeit(f"gen chunks={chunks} best-knobs", gen(chunks),
               flat_state, flat_ro, flat_rd)

    # raise the live fraction per chunk by chunking over COLUMN-major
    # lanes?  No - rows are contiguous; instead try a coarser scene cap
    # inside chunks (live fraction per center chunk is higher).
    p2 = TraceParams(flags=flags, max_track_steps=cfg.max_track_steps,
                     bounce_compact_frac=0.0, scene_compact_frac=0.32)
    def gen2(chunks):
        def f(s, o, d):
            return _map_chunks(
                lambda sc, oc, dc: trace_primary(sc, vol, lights, p2, oc,
                                                 dc, cfg),
                chunks, s, o, d)
        return f
    timeit("gen chunks=8 s=.32", gen2(8), flat_state, flat_ro, flat_rd)


if __name__ == "__main__":
    main()
