"""Fast stage profiling of the TPU-tuned NRC frame: feedback-chained wall
clock per stage (outputs feed inputs across iterations so the axon tunnel's
early block_until_ready ack cannot hide device time), one compile per stage.

Unlike nrc_hpm_tpu.profiler's chained-scan protocol this accepts ~tens of ms
of dispatch noise per stage — fine for attributing a multi-second frame.
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp


def timeit(name, fn, *args, n=4, feedback=None):
    """fn(*args) -> out. feedback(out, args) -> new args (defaults: replace
    args[0] if structure matches, else perturb args[0] by a zero token)."""
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        if feedback is not None:
            args = feedback(out, args)
        out = f(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:<28s} {dt*1e3:9.1f} ms", flush=True)
    return out


def tok_feedback(out, args):
    """Make iteration i+1 data-depend on iteration i's output without
    changing values: add sum(out)*0 to the first float arg."""
    t = jnp.float32(0.0)
    for l in jax.tree.leaves(out):
        if hasattr(l, "dtype") and jnp.issubdtype(l.dtype, jnp.floating):
            t = t + jnp.sum(l).astype(jnp.float32) * 0.0

    def perturb(a):
        if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating):
            return a + t.astype(a.dtype)
        return a

    return (jax.tree.map(perturb, args[0]),) + tuple(args[1:])


def main():
    print("device:", jax.devices()[0], flush=True)
    from nrc_hpm_tpu.camera import Camera, pixel_rays
    from nrc_hpm_tpu.config import AppConfig
    from nrc_hpm_tpu.renderer import (NrcRenderer, pack_nrc_inputs,
                                      primary_pass_compact, infer_filtered)
    from nrc_hpm_tpu.integrator import trace_fixed
    from nrc_hpm_tpu.utils import rng

    cfg = AppConfig.tpu_tuned()
    r = NrcRenderer(cfg)
    vol, lights = r.vol, r.lights
    cam = Camera.reference_camera(aspect=cfg.render_width /
                                  cfg.render_height)
    state = r.init_state(0)
    W, H = r.width, r.height
    N = W * H

    ro, rd, frag_uv = pixel_rays(cam, W, H)
    flat_rd = rd.reshape(N, 3)
    flat_ro = jnp.broadcast_to(ro, flat_rd.shape)
    frame_rand = jnp.asarray([0.1, 0.2, 0.3, 0.4])
    s0 = rng.init_state(frag_uv, frame_rand).reshape(N)

    # gen_rays: compacted primary pass
    def gen(s, o, d):
        p = primary_pass_compact(s, vol, lights, r.params, cfg, o, d,
                                 chunks=cfg.trace_chunks)
        return p["primary_color"], p["nrc_pos"], p["nrc_dir"], \
            p["did_scatter"]
    pc, npos, ndir, scat = timeit("gen_rays (2M compacted)", gen,
                                  s0, flat_ro, flat_rd,
                                  feedback=tok_feedback)

    # prep_infer: pack
    x5 = timeit("prep_infer (pack)", lambda p, d: pack_nrc_inputs(vol, p, d),
                npos, ndir, feedback=tok_feedback)

    # nn_infer: filtered/compacted inference
    timeit("nn_infer (compacted)",
           lambda ns_, x, s: infer_filtered(r.cache, cfg, ns_, x, s),
           state.nrc, x5, scat, feedback=tok_feedback)

    # encode-only and mlp-only at the compaction capacity
    n_inf = max(int(N * cfg.infer_compact_frac), 4096)
    xi = jax.random.uniform(jax.random.PRNGKey(1), (n_inf, 5))
    packed = r.cache.encoding.pack_params(state.nrc.ema_params["encoding"])

    timeit(f"  encode only ({n_inf})",
           lambda x: r.cache.encoding(None, x, packed=packed),
           xi, feedback=tok_feedback)
    feats = r.cache.encoding(None, xi, packed=packed)
    from nrc_hpm_tpu.ops.fused_mlp import fused_mlp_infer
    timeit(f"  fused mlp only ({n_inf})",
           lambda f: fused_mlp_infer(
               {"layers": [l.astype(jnp.float32)
                           for l in state.nrc.ema_params["mlp"]["layers"]]},
               f),
           feats, feedback=tok_feedback)

    # prep_train: 65k train rays x 32 bounces
    tw, th = r.train_w, r.train_h
    n_tr = tw * th
    t_ro = jnp.tile(jnp.asarray([[40.0, 0.0, 0.0]]), (n_tr, 1))
    key = jax.random.PRNGKey(2)
    t_rd = jax.random.normal(key, (n_tr, 3))
    t_rd = t_rd / jnp.linalg.norm(t_rd, axis=-1, keepdims=True)
    ts = rng.init_state(
        jax.random.uniform(key, (n_tr, 2)), frame_rand)

    def train_trace(s, o, d):
        res = trace_fixed(s, vol, lights, r.params, o, d,
                          cfg.train_ray_length)
        return res["radiance"]
    timeit(f"prep_train ({n_tr}x{cfg.train_ray_length})", train_trace,
           ts, t_ro, t_rd, feedback=tok_feedback)

    # nn_train: train_frame
    tx5 = jax.random.uniform(key, (n_tr, 5))
    tgt = jax.random.uniform(key, (n_tr, 3)) * 2.0
    timeit("nn_train (4 Adam batches)",
           lambda ns_, x, t: r.cache.train_frame(ns_, x, t).loss,
           state.nrc, tx5, tgt, feedback=tok_feedback)

    # full step (already-jitted renderer step)
    state = r.step(state, cam, train=True)
    jax.block_until_ready(state.image)
    t0 = time.perf_counter()
    for _ in range(4):
        state = r.step(state, cam, train=True)
    jax.block_until_ready(state.image)
    print(f"{'TOTAL (fused step)':<28s} {(time.perf_counter()-t0)/4*1e3:9.1f}"
          f" ms", flush=True)


if __name__ == "__main__":
    main()
