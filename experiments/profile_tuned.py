"""Stage-profile the TPU-tuned NRC frame (the bench.py headline config).

Runs nrc_hpm_tpu.profiler.profile_nrc_frame without the whole-step
chain-time (the jitted step's wall-clock is measured separately by
bench.py; recompiling it here costs ~minutes)."""

import sys

sys.path.insert(0, ".")

import jax

from nrc_hpm_tpu.camera import Camera
from nrc_hpm_tpu.config import AppConfig
from nrc_hpm_tpu.profiler import format_stage_report, profile_nrc_frame
from nrc_hpm_tpu.renderer import NrcRenderer


def main():
    print("device:", jax.devices()[0], flush=True)
    cfg = AppConfig.tpu_tuned()
    r = NrcRenderer(cfg)
    cam = Camera.reference_camera(aspect=cfg.render_width /
                                  cfg.render_height)
    state = r.init_state(0)
    stages = profile_nrc_frame(r, state, cam, include_total=False)
    print(format_stage_report(stages), flush=True)


if __name__ == "__main__":
    main()
