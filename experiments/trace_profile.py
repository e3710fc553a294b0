"""cProfile the Python trace+lower of the 1080p NRC train step.

Tracing is backend-independent except for is-TPU fast-path checks; run on
CPU to find where the ~380 s of trace time (compile_cache_probe.py on TPU)
is spent without occupying the chip.  NRC_TRACE_FAKE_TPU=1 monkeypatches
jax.default_backend so the TPU-only Pallas paths are traced too.
"""
import cProfile
import io
import os
import pstats
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

if os.environ.get("NRC_TRACE_FAKE_TPU"):
    _orig = jax.default_backend
    jax.default_backend = lambda: "tpu"

from nrc_hpm_tpu.camera import Camera
from nrc_hpm_tpu.config import AppConfig
from nrc_hpm_tpu.renderer import NrcRenderer

cfg = AppConfig.tpu_tuned()
r = NrcRenderer(cfg)
cam = Camera.reference_camera(aspect=cfg.render_width / cfg.render_height)
state = r.init_state(0)

t0 = time.time()
prof = cProfile.Profile()
prof.enable()
lowered = r._step_train.lower(state, cam, r.vol, r.lights)
prof.disable()
print(f"trace+lower: {time.time()-t0:.1f}s", flush=True)

s = io.StringIO()
ps = pstats.Stats(prof, stream=s).sort_stats("cumulative")
ps.print_stats(45)
print(s.getvalue())
s = io.StringIO()
ps = pstats.Stats(prof, stream=s).sort_stats("tottime")
ps.print_stats(30)
print(s.getvalue())
