"""Profile the NRC frame stage by stage on the current device.

Uses the chained-scan harness from experiments/timing.py: the axon TPU
tunnel acks block_until_ready before device work completes, so the only
trustworthy protocol is n data-dependent iterations inside one jit.
"""

import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from experiments.timing import chain_timeit


def main():
    print("device:", jax.devices()[0])
    from nrc_hpm_tpu.camera import Camera, pixel_rays
    from nrc_hpm_tpu.config import AppConfig
    from nrc_hpm_tpu.integrator import (trace_fixed, trace_scene,
                                        primary_miss_mask)
    from nrc_hpm_tpu.renderer import NrcRenderer, primary_pass_compact
    from nrc_hpm_tpu.sampling import new_ray_dir
    from nrc_hpm_tpu.transmittance import delta_track_pw, ratio_track_pw
    from nrc_hpm_tpu.utils import rng

    cfg = AppConfig()
    W, H = cfg.render_width, cfg.render_height
    N = W * H
    r = NrcRenderer(cfg)
    vol, lights, params = r.vol, r.lights, r.params
    cam = Camera.reference_camera(aspect=W / H)
    ro, rd, frag_uv = pixel_rays(cam, W, H)
    flat_rd = jnp.reshape(rd, (N, 3))
    flat_ro = jnp.broadcast_to(ro, flat_rd.shape)
    frame_rand = jnp.asarray([0.1, 0.2, 0.3, 0.4])
    s0 = rng.init_state(frag_uv, frame_rand).reshape(N)

    # --- primitives at full 1080p lanes ---
    chain_timeit("miss mask 2M", lambda o, d: primary_miss_mask(vol, o, d),
                 flat_ro, flat_rd, n=2)
    chain_timeit("delta_track_pw 2M", lambda s, o, d, v:
                 delta_track_pw(s, v, o, d)[0], s0, flat_ro, flat_rd, vol,
                 n=2)
    end = flat_ro + flat_rd * 50.0
    chain_timeit("ratio_track_pw 2M", lambda s, o, e, v:
                 ratio_track_pw(s, v, o, e)[0], s0, flat_ro, end, vol, n=2)
    chain_timeit("trace_scene 2M", lambda s, p, d, v, li:
                 trace_scene(s, v, li, params, p, d,
                             jnp.ones(s.shape, bool))[0],
                 s0, flat_ro, flat_rd, vol, lights, n=2)
    chain_timeit("new_ray_dir 2M", lambda s, d, v:
                 new_ray_dir(s, d, v.g, True)[0], s0, flat_rd, vol, n=2)

    # --- renderer stages ---
    def prim_compact(s, o, d, vol, lights):
        res = primary_pass_compact(s, vol, lights, params, cfg, o, d,
                                   chunks=cfg.trace_chunks)
        return res["primary_color"]

    chain_timeit("primary_pass_compact 1080p", prim_compact,
                 s0, flat_ro, flat_rd, vol, lights, n=2)

    tw, th, xd, yd = cfg.train_subset()
    n_train = tw * th
    t_ro = jnp.zeros((n_train, 3), jnp.float32) + 1.0
    t_rd = jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0]), (n_train, 3))
    t_state = jnp.full((n_train,), 0.4, jnp.float32)
    chain_timeit("train trace 65kx32", lambda s, o, d, v, li:
                 trace_fixed(s, v, li, params, o, d,
                             cfg.train_ray_length)["radiance"],
                 t_state, t_ro, t_rd, vol, lights, n=2)

    st = r.init_state(0)
    x5 = jax.random.uniform(jax.random.PRNGKey(4), (N, 5))
    scat = jax.random.uniform(jax.random.PRNGKey(5), (N,)) < 0.28
    chain_timeit("infer_filtered 2M",
                 lambda x, s, ns: r._infer_filtered(ns, x, s),
                 x5, scat, st.nrc, n=2)
    tx5 = jax.random.uniform(jax.random.PRNGKey(2), (n_train, 5))
    tt = jax.random.uniform(jax.random.PRNGKey(3), (n_train, 3))
    chain_timeit("train_frame 4x16k", lambda x, t, s:
                 r.cache.train_frame(s, x, t).loss, tx5, tt, st.nrc, n=2)

    def step(s, c, vol, lights):
        return r._step(s, c, vol, lights, train=True)

    chain_timeit("FULL NRC step", step, st, cam, vol, lights, n=2)


if __name__ == "__main__":
    main()
