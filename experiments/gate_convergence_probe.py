"""Track accumulated frozen-cache MSE vs training frames at the gate scale.

Answers: does the cache EVER beat untrained at 64x32, and how many
samples does it take?  Sweeps train budget variants.
"""
import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

from nrc_hpm_tpu.camera import Camera
from nrc_hpm_tpu.config import AppConfig, EncodingConfig, SceneConfig
from nrc_hpm_tpu.reference import GoldenReference
from nrc_hpm_tpu.renderer import McRenderer, NrcRenderer, reset_accumulation


def _cfg(**kw):
    base = dict(
        scene=SceneConfig.preset(4),
        render_width=64, render_height=32,
        nn_width=32, nn_depth=2,
        encoding=EncodingConfig(n_levels=4, log2_hashmap_size=12),
        log2_infer_batch_size=11, log2_train_batch_size=6,
        train_batch_count=2,
        train_ray_length=6, mc_path_length=8)
    base.update(kw)
    return AppConfig(**base)


def accumulated_compare(renderer, st, golden, frames=12):
    tmp = reset_accumulation(jax.tree.map(lambda a: a + 0, st))
    for _ in range(frames):
        tmp = renderer.step(tmp, golden.camera, train=False)
    return golden.compare(np.asarray(tmp.image))


def run(tag, total_frames=240, check_every=40, **kw):
    cfg = _cfg(**kw)
    W, H = cfg.render_width, cfg.render_height
    cam = Camera.reference_camera(aspect=W / H)
    mc = McRenderer(cfg)
    golden_img = np.asarray(mc.render(cam, frames=48, seed=7))
    golden = GoldenReference(golden_img, camera=cam)

    r = NrcRenderer(cfg)
    state = r.init_state(0)
    res0 = accumulated_compare(r, state, golden)
    print(f"[{tag}] untrained mse={res0.mse:.5f}", flush=True)
    for f in range(total_frames):
        state = r.step(state, cam, train=True)
        if (f + 1) % check_every == 0:
            res = accumulated_compare(r, state, golden)
            print(f"[{tag}] frames={f+1} steps={int(state.nrc.step)} "
                  f"mse={res.mse:.5f} ratio={res.mse/res0.mse:.3f} "
                  f"loss={float(state.nrc.loss):.3f}", flush=True)


if __name__ == "__main__":
    run("base", total_frames=240, check_every=40)
    # 8x the data rate: 1024 train pixels/frame (16 batches of 64)
    run("big", total_frames=120, check_every=20, train_batch_count=16)
