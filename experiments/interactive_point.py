"""Round-5 (VERDICT r4 item 2): demonstrate an INTERACTIVE operating
point — the capability class the reference claims in its title.

Sweeps online-NRC configurations at reduced resolutions and records
ms/frame + fps for each; the chosen point is then quality-traced by
experiments/interactive_quality.py against a matching golden and both
go into output/interactive_r5.json + BASELINE.md.

Config axes:
  res        480x270 (1/16 of 1080p) and 320x180 (1/36)
  train      batches x 2^log2 samples/frame (the reference trains 4x2^14
             at 1080p = 3.2% of pixels; the same fraction of 480x270 is
             ~4k samples)
  train_len  32 (reference parity)
"""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/experiments")

import jax
import jax.numpy as jnp

from nrc_hpm_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()


def run_point(tag, cfg, frames=10, train_every=1):
    from nrc_hpm_tpu.camera import Camera
    from nrc_hpm_tpu.renderer import NrcRenderer

    r = NrcRenderer(cfg)
    cam = Camera.reference_camera(
        aspect=cfg.render_width / cfg.render_height)
    state = r.init_state(0)
    t0 = time.time()
    state = r.step(state, cam, train=True)
    if train_every > 1:
        state = r.step(state, cam, train=False)  # compile frozen too
    float(jnp.sum(state.image))
    compile_s = time.time() - t0

    t0 = time.time()
    for i in range(frames):
        state = r.step(state, cam, train=(i % train_every == 0))
    float(jnp.sum(state.image))
    dt = (time.time() - t0) / frames
    n = cfg.render_width * cfg.render_height
    rec = dict(tag=tag, width=cfg.render_width, height=cfg.render_height,
               train_samples=cfg.train_pixel_count,
               train_every=train_every,
               ms_per_frame=round(dt * 1000, 1),
               fps=round(1.0 / dt, 2),
               rays_per_s=round(n / dt, 1),
               compile_plus_first_s=round(compile_s, 1),
               loss=round(float(state.nrc.loss), 4))
    print(json.dumps(rec), flush=True)
    return rec


def main():
    from nrc_hpm_tpu.config import AppConfig, EncodingConfig, SceneConfig

    print("device:", jax.devices()[0], file=sys.stderr, flush=True)
    enc = EncodingConfig(log2_hashmap_size=14)
    results = []

    # 480x270: reference train fraction (3.2% of pixels = 2 x 2^11)
    for tag, w, h, tb, l2t, every in [
        ("480x270 train 2x2^11", 480, 270, 2, 11, 1),
        ("480x270 train 1x2^12", 480, 270, 1, 12, 1),
        ("480x270 train 4x2^12 every 4", 480, 270, 4, 12, 4),
        ("320x180 train 2x2^11", 320, 180, 2, 11, 1),
    ]:
        cfg = AppConfig(
            scene=SceneConfig.preset(4), render_width=w, render_height=h,
            encoding=enc,
            log2_infer_batch_size=17, log2_train_batch_size=l2t,
            train_batch_count=tb)
        try:
            results.append(run_point(tag, cfg, train_every=every))
        except Exception as e:
            print(f"{tag} failed: {e}", file=sys.stderr, flush=True)

    os.makedirs("output", exist_ok=True)
    with open("output/interactive_sweep_r5.json", "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
