"""Sweep the pw-tracking segment size and stage plans on the real 1080p
gen_rays workload (the frame's dominant stage).

Each variant recompiles trace_primary (~40 s); timings are chained with a
data-dependent scalar fetch (gen_decomp.timeit).

Usage: python experiments/plan_sweep.py [variant ...]
"""
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from nrc_hpm_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()

import nrc_hpm_tpu.transmittance as tr
from experiments.gen_decomp import timeit
from nrc_hpm_tpu.camera import Camera, pixel_rays
from nrc_hpm_tpu.config import AppConfig
from nrc_hpm_tpu.integrator import TraceParams, trace_primary
from nrc_hpm_tpu.lights import LightFlags, lights_from_scene
from nrc_hpm_tpu.renderer import _volume_from_config
from nrc_hpm_tpu.utils import rng

VARIANTS = {
    # name: (segment, RATIO_PLAN, DELTA_PLAN)
    "base8": (8, ((None, 8, 16), (0.08, 8, None)),
              ((0.55, 8, 16), (0.10, 8, None))),
    "seg4": (4, ((None, 4, 16), (0.08, 4, None)),
             ((0.55, 4, 16), (0.10, 4, None))),
    "seg16": (16, ((None, 16, 16), (0.08, 16, None)),
              ((0.55, 16, 16), (0.10, 16, None))),
    # delta stage0 shorter burst: resolve-fast lanes stop paying overdraw
    "d8_8": (8, ((None, 8, 16), (0.08, 8, None)),
             ((0.55, 8, 8), (0.10, 8, None))),
    # tighter tail caps
    "tight": (8, ((None, 8, 16), (0.05, 8, None)),
              ((0.45, 8, 16), (0.06, 8, None))),
    "t16": (16, ((None, 16, 16), (0.05, 16, None)),
            ((0.45, 16, 16), (0.06, 16, None))),
    "t16c": (16, ((None, 16, 16), (0.05, 16, None)),
             ((0.45, 16, 32), (0.04, 16, None))),
    "seg32": (32, ((None, 32, 32), (0.05, 32, None)),
              ((0.45, 32, 32), (0.06, 32, None))),
    "t16_3": (16, ((None, 16, 16), (0.05, 16, 48), (0.012, 16, None)),
              ((0.45, 16, 16), (0.06, 16, 48), (0.012, 16, None))),
    "t16_3b": (16, ((None, 16, 32), (0.03, 16, None)),
               ((0.45, 16, 16), (0.06, 16, 48), (0.012, 16, None))),
    # 3-stage delta with shrinking widths
    "d3": (8, ((None, 8, 16), (0.08, 8, None)),
           ((0.55, 8, 8), (0.22, 8, 24), (0.06, 8, None))),
}


def main():
    names = sys.argv[1:] or list(VARIANTS)
    cfg = AppConfig.tpu_tuned()
    W, H = cfg.render_width, cfg.render_height
    vol = _volume_from_config(cfg)
    lights = lights_from_scene(cfg.scene)
    cam = Camera.reference_camera(aspect=W / H)
    ro, rd, frag_uv = pixel_rays(cam, W, H)
    state = rng.init_state(frag_uv, jnp.array([0.1, 0.2, 0.3, 0.4]))
    n = W * H
    fd = rd.reshape(n, 3)
    fo = jnp.broadcast_to(ro, fd.shape)
    fs = state.reshape(n)
    flags = LightFlags.from_scene(cfg.scene)

    for name in names:
        seg, rp, dp = VARIANTS[name]
        tr.RATIO_PLAN, tr.DELTA_PLAN = rp, dp
        p = TraceParams(flags=flags, max_track_steps=cfg.max_track_steps,
                        segment=seg)

        def f(s, o, d, p=p):
            return trace_primary(s, vol, lights, p, o, d, cfg)
        timeit(name, f, fs, fo, fd)


if __name__ == "__main__":
    main()
