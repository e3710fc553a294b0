"""Round-5: can chunked software pipelining break the fine-gather
dependence penalty?

r5_gather_anomaly measured the kernel->gather composition at 152.8 ms
when the gather consumes the kernel's indices vs 60.6 ms when the same
gather's index buffer pre-exists (BASELINE.md round 5) — consistent with
the gather fusion's index staging only prefetching when its input buffer
is finalized before the PRECEDING fusion starts executing.

The event-kernel chain (e_last -> e_new) never depends on the gather
results, so the composition can be chunk-pipelined: run the kernel on
every chunk FIRST, then gather each chunk — each gather's index buffer
was then produced >= 2 fusions earlier and its staging can overlap the
fusion before it.  Variants:

  A    full-width kernel -> gather (the production stage-0 shape)
  A2   2 lane-chunks, serial per chunk: K0 G0 K1 G1
  P2   2 lane-chunks, pipelined:       K0 K1 | G0 G1  (barrier)
  P4   4 lane-chunks, pipelined:       K0..K3 | G0..G3
"""

import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/experiments")

import jax
import jax.numpy as jnp

from nrc_hpm_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()

from timing import chain_timeit


def main():
    from nrc_hpm_tpu.camera import Camera, pixel_rays
    from nrc_hpm_tpu.config import AppConfig
    import nrc_hpm_tpu.transmittance as T
    import nrc_hpm_tpu.ops.pw_kernels as K
    from nrc_hpm_tpu.renderer import _volume_from_config
    from nrc_hpm_tpu.utils import rng
    from nrc_hpm_tpu.volume import find_entry_exit

    print("device:", jax.devices()[0], flush=True)
    cfg = AppConfig()
    W, H = cfg.render_width, cfg.render_height
    N = W * H
    vol = _volume_from_config(cfg)
    cam = Camera.reference_camera(aspect=W / H)
    ro, rd, uv = pixel_rays(cam, W, H)
    frd = jnp.reshape(rd, (N, 3))
    fro = jnp.broadcast_to(ro, frd.shape)
    s0 = rng.init_state(uv, jnp.asarray([0.1, 0.2, 0.3, 0.4])).reshape(N)
    seed, _ = T._track_seed(s0)
    _, exit_pt, _ = find_entry_exit(vol, fro, frd)
    tmax = jnp.linalg.norm(exit_pt - fro, axis=-1)
    M = 1036800
    a, b, t, s = fro[:M], frd[:M], tmax[:M], seed[:M]
    el = jnp.zeros((M,), jnp.float32)
    gf = vol.grid.reshape(-1)
    scale = vol.density_factor * (1.0 / 255.0)

    def kern(a, b, t, s, e):
        return K.pw_events(vol, a, b, t, s, e, 0, S=16, salt=K._SALT_DELTA)

    def fold(dens, tt, c_at, sres):
        f = jnp.where(tt < 0, 1.0,
                      1.0 - jnp.clip(dens - c_at, 0, None) / sres)
        return jnp.prod(f, axis=0)

    def resolve(ev):
        raw = jnp.take(gf, ev["lin"], mode="fill", fill_value=0)
        return fold(raw.astype(jnp.float32) * scale, ev["t"], ev["c_at"],
                    ev["sres"])

    def A(a, b, t, s, e):
        ev = kern(a, b, t, s, e)
        return resolve(ev), ev["e_new"]

    def chunked(n_chunks, pipelined):
        def f(a, b, t, s, e):
            m = M // n_chunks
            evs = [kern(a[i * m:(i + 1) * m], b[i * m:(i + 1) * m],
                        t[i * m:(i + 1) * m], s[i * m:(i + 1) * m],
                        e[i * m:(i + 1) * m]) for i in range(n_chunks)]
            if pipelined:
                # one barrier ties every kernel output together so XLA
                # cannot schedule any gather before the last kernel
                flat, tree = jax.tree_util.tree_flatten(evs)
                flat = jax.lax.optimization_barrier(tuple(flat))
                evs = jax.tree_util.tree_unflatten(tree, list(flat))
            outs = [resolve(ev) for ev in evs]
            enew = [ev["e_new"] for ev in evs]
            return jnp.concatenate(outs), jnp.concatenate(enew)
        return f

    chain_timeit("A  full-width dependent", A, a, b, t, s, el, n=3)
    chain_timeit("A2 2-chunk serial", chunked(2, False), a, b, t, s, el,
                 n=3)
    chain_timeit("P2 2-chunk pipelined", chunked(2, True), a, b, t, s, el,
                 n=3)
    chain_timeit("P4 4-chunk pipelined", chunked(4, True), a, b, t, s, el,
                 n=3)
    chain_timeit("P8 8-chunk pipelined", chunked(8, True), a, b, t, s, el,
                 n=3)


if __name__ == "__main__":
    main()
