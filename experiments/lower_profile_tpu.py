"""cProfile .lower() of the 1080p NRC train step ON the TPU backend —
finds where the ~320 s of trace+lower goes (CPU-only lowering of the same
step takes 19 s; the difference is in the TPU/Pallas lowering path)."""
import cProfile
import io
import pstats
import time

from nrc_hpm_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()

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
prof = cProfile.Profile()
prof.enable()
lowered = r._step_train.lower(state, cam, r.vol, r.lights)
prof.disable()
print(f"trace+lower: {time.time()-t0:.1f}s", flush=True)

for sort in ("cumulative", "tottime"):
    s = io.StringIO()
    ps = pstats.Stats(prof, stream=s).sort_stats(sort)
    ps.print_stats(40)
    print(s.getvalue())
