"""Long-budget ABSOLUTE bias gate for the point-light presets (VERDICT r4
item 7).

The calibrated short-run golden gates (test_goldens_all_scenes) compare
10-frame runs around per-scene centers (-0.081 / -0.222 for presets 1/2)
because min(mean_n, clip) is concave — the short side sits systematically
below the golden under the firefly clamp.  That calibration could hide a
genuine bias of the same magnitude forever.  This test is the complement:
a 256-frame accumulation (where the concave-clamp offset has converged
away) compared UNCLAMPED, asserting small absolute bias.

Runtime: ~2-4 min/scene on CPU, so the test is gated behind
NRC_SLOW_TESTS=1 (the driver's quick CI skips it).  Last full run is
recorded in BASELINE.md ("Long-budget bias gate" section).
"""
import os

import numpy as np
import pytest

from nrc_hpm_tpu.camera import Camera
from nrc_hpm_tpu.config import AppConfig, SceneConfig
from nrc_hpm_tpu.reference import GoldenReference
from nrc_hpm_tpu.renderer import McRenderer

W, H, FRAMES = 96, 54, 256

pytestmark = [
    pytest.mark.skipif(
        not os.path.exists("reference/1/low.exr"),
        reason="checked-in goldens not generated yet"),
    pytest.mark.skipif(
        not os.environ.get("NRC_SLOW_TESTS"),
        reason="long-budget gate: set NRC_SLOW_TESTS=1 (~5 min)"),
]


@pytest.mark.parametrize("scene_id", [1, 2])
def test_long_budget_absolute_bias(scene_id):
    golden = GoldenReference.load(
        scene_id, search_paths=("reference",), names=("low.exr",))
    cfg = AppConfig(scene=SceneConfig.preset(scene_id), render_width=W,
                    render_height=H, mc_path_length=32)
    r = McRenderer(cfg)
    cam = Camera.reference_camera(aspect=W / H)
    img = np.asarray(r.render(cam, frames=FRAMES, seed=scene_id + 17))
    res = golden.compare(img)  # UNCLAMPED
    assert np.isfinite(res.mse)
    assert abs(res.rel_bias) < 0.05, (scene_id, res)
