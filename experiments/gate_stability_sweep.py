"""Sweep (batch size, lr, ema, train_fast) at the gate scale to find a
stable operating point for the NRC quality gate."""
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


_GOLDEN = {}


def golden_for(cfg):
    if "g" not in _GOLDEN:
        cam = Camera.reference_camera(aspect=cfg.render_width
                                      / cfg.render_height)
        mc = McRenderer(cfg)
        img = np.asarray(mc.render(cam, frames=48, seed=7))
        _GOLDEN["g"] = GoldenReference(img, camera=cam)
    return _GOLDEN["g"]


def accumulated_compare(renderer, st, golden, frames=12):
    tmp = reset_accumulation(jax.tree.map(lambda a: a + 0, st))
    for _ in range(frames):
        tmp = renderer.step(tmp, golden.camera, train=False)
    return golden.compare(np.asarray(tmp.image))


def run(tag, total_frames=120, check_every=20, **kw):
    cfg = _cfg(**kw)
    cam = Camera.reference_camera(aspect=2.0)
    golden = golden_for(cfg)
    r = NrcRenderer(cfg)
    state = r.init_state(0)
    res0 = accumulated_compare(r, state, golden)
    ratios = []
    for f in range(total_frames):
        state = r.step(state, cam, train=True)
        if (f + 1) % check_every == 0:
            res = accumulated_compare(r, state, golden)
            ratios.append(res.mse / res0.mse)
    print(f"[{tag}] mse0={res0.mse:.5f} ratios=" +
          " ".join(f"{x:.3f}" for x in ratios), flush=True)


if __name__ == "__main__":
    run("b256_lr.01", log2_train_batch_size=8)
    run("b256_lr.003", log2_train_batch_size=8, learning_rate=0.003)
    run("b64_lr.003", learning_rate=0.003)
    run("b64_nofast", hash_train_fast=False)
    run("b256_ema.995", log2_train_batch_size=8, ema_decay=0.995)
