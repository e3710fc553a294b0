"""Does the persistent XLA compilation cache capture axon-TPU compiles?

Lowers + compiles the full tpu_tuned 1080p train step with the cache
enabled and prints trace/compile seconds.  Run twice (two processes): a
second-run compile in single-digit seconds means the cache works through
the tunnel and every scripted TPU run this session pays compile once.
"""
import time

from nrc_hpm_tpu.utils.compile_cache import enable_compilation_cache

print("cache dir:", enable_compilation_cache(), flush=True)

import jax

from nrc_hpm_tpu.camera import Camera
from nrc_hpm_tpu.config import AppConfig
from nrc_hpm_tpu.renderer import NrcRenderer

print("device:", jax.devices()[0], flush=True)
cfg = AppConfig.tpu_tuned()
r = NrcRenderer(cfg)
cam = Camera.reference_camera(aspect=cfg.render_width / cfg.render_height)
state = r.init_state(0)
t0 = time.time()
lowered = r._step_train.lower(state, cam, r.vol, r.lights)
t1 = time.time()
lowered.compile()
t2 = time.time()
print(f"trace+lower {t1 - t0:.1f}s  compile {t2 - t1:.1f}s", flush=True)
