"""Probe: does the NRC quality gate failure come from EMA lag?

Runs the exact gate setup from tests/test_nrc_renderer.py with
(a) current EMA(0.99), (b) ema_decay=0.0 (serve raw trained params),
and prints accumulated MSE vs untrained for both.
"""
import numpy as np
import jax

# Select CPU the way tests/conftest.py does: via jax.config, NOT the
# JAX_PLATFORMS env var (overriding that hangs the axon site import).
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


def run(ema_decay):
    cfg = _cfg(ema_decay=ema_decay)
    W, H = cfg.render_width, cfg.render_height
    cam = Camera.reference_camera(aspect=W / H)
    mc = McRenderer(cfg)
    golden_img = np.asarray(mc.render(cam, frames=48, seed=7))
    golden = GoldenReference(golden_img, camera=cam)

    r = NrcRenderer(cfg)
    state = r.init_state(0)
    for _ in range(30):
        state = r.step(state, cam, train=True)
    res = accumulated_compare(r, state, golden)

    r2 = NrcRenderer(cfg)
    res0 = accumulated_compare(r2, r2.init_state(0), golden)
    print(f"ema_decay={ema_decay}: trained mse={res.mse:.5f} "
          f"untrained mse={res0.mse:.5f} ratio={res.mse/res0.mse:.3f} "
          f"rel_bias={res.rel_bias:.3f} loss={float(state.nrc.loss):.3f}")


if __name__ == "__main__":
    run(0.99)
    run(0.0)
