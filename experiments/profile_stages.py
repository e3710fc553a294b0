"""Profile the NRC frame stage by stage on the current device.

Also micro-benchmarks the raw primitives (density gather, tracking calls,
hash encode, MLP) to locate the bottleneck precisely.
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from nrc_hpm_tpu.camera import Camera, pixel_rays
from nrc_hpm_tpu.config import AppConfig
from nrc_hpm_tpu.integrator import TraceParams, trace_fixed
from nrc_hpm_tpu.lights import LightFlags, lights_from_scene
from nrc_hpm_tpu.renderer import NrcRenderer, pack_nrc_inputs, primary_pass
from nrc_hpm_tpu.transmittance import delta_track_fast, ratio_track_fast
from nrc_hpm_tpu.utils import rng
from nrc_hpm_tpu.volume import get_density


def timeit(name, fn, *args, n=3):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"{name:<38s} {dt:9.2f} ms")
    return out


def main():
    print("device:", jax.devices()[0])
    cfg = AppConfig()
    W, H = cfg.render_width, cfg.render_height
    N = W * H
    r = NrcRenderer(cfg)
    vol, lights, params = r.vol, r.lights, r.params
    cam = Camera.reference_camera(aspect=W / H)

    ro, rd, frag_uv = pixel_rays(cam, W, H)
    ro_b = jnp.broadcast_to(ro, rd.shape)
    frame_rand = jnp.asarray([0.1, 0.2, 0.3, 0.4])
    state0 = rng.init_state(frag_uv, frame_rand)

    # --- primitives ---
    pos = jax.random.uniform(jax.random.PRNGKey(0), (N, 32, 3)) * 80 - 40
    timeit("density gather (N,32)", jax.jit(lambda p: get_density(vol, p)),
           pos)
    flat = jnp.reshape(rd, (-1, 3))
    sflat = jnp.reshape(state0, (-1,))
    timeit("delta_track_fast (N)", jax.jit(
        lambda s, o, d: delta_track_fast(s, vol, o, d)[0]),
        sflat, jnp.reshape(ro_b, (-1, 3)), flat)
    timeit("ratio_track_fast (N)", jax.jit(
        lambda s, o, d: ratio_track_fast(s, vol, o, o + d * 50.0)[0]),
        sflat, jnp.reshape(ro_b, (-1, 3)), flat)

    x5 = jax.random.uniform(jax.random.PRNGKey(1), (N, 5))
    nrc_state = r.init_state(0).nrc
    enc = r.cache.encoding
    timeit("hash encode (N)", jax.jit(
        lambda p, x: enc(p, x)), nrc_state.ema_params["encoding"], x5)
    feats = enc(nrc_state.ema_params["encoding"], x5)
    from nrc_hpm_tpu.models.nrc.mlp import mlp_apply
    timeit("mlp 64x6 (N)", jax.jit(
        lambda p, f: mlp_apply(p, f)), nrc_state.ema_params["mlp"], feats)
    timeit("full infer (N)", jax.jit(
        lambda st, x: r.cache.infer(st, x)), nrc_state, x5)

    # --- stages ---
    prim_fn = jax.jit(lambda s, o, d: primary_pass(
        s, vol, lights, params, cfg, o, d))
    prim = timeit("primary_pass 1080p", prim_fn, state0, ro_b, rd)

    tw, th, xd, yd = cfg.train_subset()
    n_train = tw * th
    t_ro = jnp.zeros((n_train, 3), jnp.float32)
    t_rd = jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0]), (n_train, 3))
    t_state = jnp.full((n_train,), 0.4, jnp.float32)
    timeit("train rays 65k x 32", jax.jit(
        lambda s, o, d: trace_fixed(s, vol, lights, params, o, d,
                                    cfg.train_ray_length)["radiance"]),
        t_state, t_ro, t_rd)

    tx5 = jax.random.uniform(jax.random.PRNGKey(2), (n_train, 5))
    tt = jax.random.uniform(jax.random.PRNGKey(3), (n_train, 3))
    train_fn = jax.jit(lambda st, x, t: r.cache.train_frame(st, x, t))
    timeit("train_frame 4x16k", train_fn, nrc_state, tx5, tt)

    step_fn = jax.jit(lambda st, c: r._step(st, c, vol, lights, train=True))
    st = r.init_state(0)
    st2 = timeit("FULL NRC STEP", step_fn, st, cam, n=2)


if __name__ == "__main__":
    main()
