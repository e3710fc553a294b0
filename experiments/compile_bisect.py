"""Bisect the 1080p NRC-step compile time by feature flags.

Lowers + compiles the train step (no execution) for config variants and
prints per-variant compile seconds.  NRC_NO_COMPILE_CACHE=1 is forced so
the persistent cache cannot hide the cost.
"""
import os
import time

os.environ["NRC_NO_COMPILE_CACHE"] = "1"

import jax

from nrc_hpm_tpu.camera import Camera
from nrc_hpm_tpu.config import AppConfig
from nrc_hpm_tpu.renderer import NrcRenderer


def compile_variant(tag, **over):
    import dataclasses
    cfg = AppConfig.tpu_tuned()
    params_over = {k: over.pop(k) for k in list(over)
                   if k in ("mode", "event_compact", "bounce_compact_frac",
                            "scene_compact_frac")}
    if over:
        cfg = dataclasses.replace(cfg, **over)
    r = NrcRenderer(cfg)
    if params_over:
        r.params = dataclasses.replace(r.params, **params_over)
        import functools
        r._step_train = jax.jit(functools.partial(r._step, train=True),
                                donate_argnums=(0,))
    cam = Camera.reference_camera(aspect=cfg.render_width
                                  / cfg.render_height)
    state = r.init_state(0)
    t0 = time.time()
    lowered = r._step_train.lower(state, cam, r.vol, r.lights)
    t1 = time.time()
    compiled = lowered.compile()
    t2 = time.time()
    print(f"{tag:28s} trace+lower {t1-t0:7.1f}s  compile {t2-t1:7.1f}s",
          flush=True)
    del compiled


if __name__ == "__main__":
    import sys
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    variants = {
        "base": {},
        "no_event_compact": dict(event_compact=False),
        "no_outer_compact": dict(compact=False),
        "no_bounce_compact": dict(bounce_compact_frac=0.0),
        "nothing_compact": dict(event_compact=False, compact=False,
                                bounce_compact_frac=0.0),
    }
    for tag, over in variants.items():
        if which not in ("all", tag):
            continue
        compile_variant(tag, **over)
