"""Validate the gate redesign: fixed compare key + more accumulation frames
should make trained-vs-untrained ratios stable across checkpoints."""
import numpy as np
import jax
import jax.numpy as jnp

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


def fixed_compare(renderer, st, golden, frames=24, key=1234):
    tmp = reset_accumulation(jax.tree.map(lambda a: a + 0, st))
    tmp = tmp.replace(key=jax.random.PRNGKey(key))
    for _ in range(frames):
        tmp = renderer.step(tmp, golden.camera, train=False)
    return golden.compare(np.asarray(tmp.image))


def main():
    cfg = _cfg()
    cam = Camera.reference_camera(aspect=2.0)
    mc = McRenderer(cfg)
    golden = GoldenReference(np.asarray(mc.render(cam, frames=48, seed=7)),
                             camera=cam)
    r = NrcRenderer(cfg)
    state = r.init_state(0)
    res0 = fixed_compare(r, state, golden)
    print(f"untrained mse={res0.mse:.5f}", flush=True)
    for f in range(120):
        state = r.step(state, cam, train=True)
        if (f + 1) % 15 == 0:
            res = fixed_compare(r, state, golden)
            print(f"frames={f+1} mse={res.mse:.5f} "
                  f"ratio={res.mse/res0.mse:.3f} "
                  f"rel_bias={res.rel_bias:+.3f}", flush=True)


if __name__ == "__main__":
    main()
