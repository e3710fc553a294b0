"""Cross-scene quality net against the checked-in low-res goldens.

``reference/<id>/low.exr`` are 192x108 goldens of 256 accumulated
64-bounce MC frames (1024 for scene 3's canonical ``reference/3/0.exr``),
generated on the TPU by experiments/make_goldens.py
through reference.generate_golden — the working form of the reference's
dead GenRefImages branch (Reference.cpp:566-671, SURVEY quirk 3).  Scene 3
additionally gets ``reference/3/0.exr`` (the upstream repo never shipped
one).

Each preset gets a short CPU MC run compared via the reference's
comparator semantics: mean brightness must land within a few percent
(32-bounce truncation + accumulation noise set the tolerance).  All six
presets share one compiled program (identical shapes), so the suite pays
one compile.
"""
import os

import numpy as np
import pytest

from nrc_hpm_tpu.camera import Camera
from nrc_hpm_tpu.config import AppConfig, SceneConfig
from nrc_hpm_tpu.reference import GoldenReference
from nrc_hpm_tpu.renderer import McRenderer

W, H, FRAMES = 96, 54, 10

pytestmark = pytest.mark.skipif(
    not os.path.exists("reference/0/low.exr"),
    reason="checked-in goldens not generated yet")


@pytest.mark.parametrize("scene_id", range(6))
def test_short_mc_run_matches_checked_in_golden(scene_id):
    golden = GoldenReference.load(
        scene_id, search_paths=("reference",), names=("low.exr",))
    assert golden.image.shape == (108, 192, 4)
    cfg = AppConfig(scene=SceneConfig.preset(scene_id), render_width=W,
                    render_height=H, mc_path_length=32)
    r = McRenderer(cfg)
    cam = Camera.reference_camera(aspect=W / H)
    img = np.asarray(r.render(cam, frames=FRAMES, seed=scene_id + 1))
    res = golden.compare(img)
    assert np.isfinite(res.mse)
    # 10 accumulated frames vs the 256-frame golden: the raw mean is
    # firefly-dominated for the point-light-in-dense-medium presets (a
    # single heavy-tail path moves a 10-frame 96x54 mean by >100%, measured
    # rel_bias spread at seed sweep: -0.16..+1.46 for scene 2), so the bias
    # gate scores the clamped distribution body instead: clamp both images
    # at 20x the golden mean before comparing.
    clip = 20.0 * float(golden.image[..., :3].mean())
    robust = golden.compare(img, clip=clip)
    assert abs(robust.rel_bias) < 0.08, (scene_id, res, robust)


def test_scene3_promoted_golden_exists_and_loads():
    golden = GoldenReference.load(
        3, search_paths=("reference",), names=("0.exr",))
    assert golden.image.shape == (108, 192, 4)
    assert np.isfinite(golden.image).all()
