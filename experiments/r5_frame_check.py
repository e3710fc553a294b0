"""Round-5 checkpoint: tracking calls + gen_rays + whole frame after the
packed-row compaction takes (ops/compaction.take_rows).

Run stages: NRC_FRAME_ONLY=1 skips the micro calls (for re-runs).
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/experiments")

import jax
import jax.numpy as jnp
import numpy as np

from nrc_hpm_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()

from timing import chain_timeit


def main():
    from nrc_hpm_tpu.camera import Camera, pixel_rays
    from nrc_hpm_tpu.config import AppConfig
    import nrc_hpm_tpu.transmittance as tr
    from nrc_hpm_tpu.renderer import NrcRenderer, primary_pass
    from nrc_hpm_tpu.utils import rng
    from nrc_hpm_tpu.volume import find_entry_exit

    print("device:", jax.devices()[0], flush=True)
    cfg = AppConfig.tpu_tuned()
    W, H = cfg.render_width, cfg.render_height
    N = W * H
    r = NrcRenderer(cfg)
    vol, lights = r.vol, r.lights
    cam = Camera.reference_camera(aspect=W / H)
    ro, rd, frag_uv = pixel_rays(cam, W, H)
    flat_rd = jnp.reshape(rd, (N, 3)).block_until_ready()
    flat_ro = jnp.broadcast_to(ro, flat_rd.shape)
    s0 = rng.init_state(frag_uv, jnp.asarray([0.1, 0.2, 0.3, 0.4]))
    s0 = s0.reshape(N)

    if not os.environ.get("NRC_FRAME_ONLY"):
        chain_timeit("delta @2.07M (packed takes)",
                     lambda s, a, b: tr.delta_track_pw(s, vol, a, b),
                     s0, flat_ro, flat_rd, n=3)

        pos, exited, _ = jax.jit(
            lambda s, a, b: tr.delta_track_pw(s, vol, a, b))(
            s0, flat_ro, flat_rd)
        cap = 995328
        (idx,) = jnp.nonzero(np.asarray(~exited), size=cap // 2,
                             fill_value=N)
        spos = jnp.take(pos, idx, axis=0, mode="fill", fill_value=0)
        dl = lights.dir_light
        to_exit = -dl.direction / jnp.linalg.norm(dl.direction)
        _, sexit, _ = find_entry_exit(
            vol, spos, jnp.broadcast_to(to_exit, spos.shape))
        spos2 = jnp.concatenate([spos, spos], axis=0)
        send2 = jnp.concatenate([sexit, sexit], axis=0)
        sst2 = jnp.concatenate([s0[:cap // 2], s0[:cap // 2]], axis=0)
        chain_timeit("ratio @995k shadow (packed takes)",
                     lambda s, a, b: tr.ratio_track_pw(s, vol, a, b),
                     sst2, spos2, send2, n=3)

        chain_timeit("gen_rays primary_pass @1080p",
                     lambda s, o, d: primary_pass(
                         s, vol, lights, r.primary_params, cfg, o, d),
                     s0, flat_ro, flat_rd, n=2)

    # whole online frame
    state = r.init_state(0)
    t0 = time.time()
    state = r.step(state, cam, train=True)
    tok = float(jnp.sum(state.image))
    print(f"compile+first frame: {time.time()-t0:.1f} s", flush=True)
    t0 = time.time()
    frames = 6
    for _ in range(frames):
        state = r.step(state, cam, train=True)
    tok = float(jnp.sum(state.image))
    dt = (time.time() - t0) / frames
    print(f"online frame: {dt*1000:.1f} ms  {N/dt:.3e} rays/s "
          f"(loss {float(state.nrc.loss):.3f})", flush=True)


if __name__ == "__main__":
    main()
