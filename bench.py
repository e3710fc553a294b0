"""Benchmark entry point: one JSON line for the driver.

Headline metric: rays/s for the full online-NRC frame (trace + cache
inference over every pixel + 65,536 train samples through 4 Adam batches +
composite) at the reference's canonical 1920x1080 workload
(src/main.cu:156-157,432-439) on one TPU chip.

Extra context metrics go to stderr; stdout carries exactly one JSON line.
"""

import json
import sys
import time


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax

    from nrc_hpm_tpu.camera import Camera
    from nrc_hpm_tpu.config import AppConfig
    from nrc_hpm_tpu.renderer import McRenderer, NrcRenderer

    dev = jax.devices()[0]
    log(f"device: {dev}")

    cfg = AppConfig()  # the reference default config (scene 4, 1080p)
    cam = Camera.reference_camera(aspect=cfg.render_width / cfg.render_height)
    n_rays = cfg.render_width * cfg.render_height

    # ---- NRC online-training frame (the headline) ----
    r = NrcRenderer(cfg)
    state = r.init_state(0)
    t0 = time.time()
    state = r.step(state, cam, train=True)
    jax.block_until_ready(state.image)
    log(f"nrc compile+first frame: {time.time()-t0:.1f}s")

    frames = 5
    t0 = time.time()
    for _ in range(frames):
        state = r.step(state, cam, train=True)
    jax.block_until_ready(state.image)
    dt = time.time() - t0
    nrc_rays_s = n_rays * frames / dt
    log(f"nrc: {dt/frames*1000:.1f} ms/frame, {nrc_rays_s:.3e} rays/s, "
        f"loss {float(state.nrc.loss):.4f}")

    # ---- context: MC renderer rays/s ----
    try:
        mc = McRenderer(cfg)
        mst = mc.init_state(0)
        mst = mc.step(mst, cam)
        jax.block_until_ready(mst.image)
        t0 = time.time()
        for _ in range(3):
            mst = mc.step(mst, cam)
        jax.block_until_ready(mst.image)
        mc_dt = (time.time() - t0) / 3
        log(f"mc32: {mc_dt*1000:.1f} ms/frame, {n_rays/mc_dt:.3e} rays/s")
    except Exception as e:  # context metric only — never fail the bench
        log(f"mc bench skipped: {e}")

    print(json.dumps({
        "metric": "nrc_online_rays_per_s_1080p",
        "value": round(nrc_rays_s, 1),
        "unit": "rays/s/chip",
        "vs_baseline": 1.0,
    }))


if __name__ == "__main__":
    sys.path.insert(0, ".")
    main()
