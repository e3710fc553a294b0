"""Round-5: decompose delta_track_pw's 442 ms at 2.07M lanes.

Known pieces (r5_track_decomp): pw_profile 10.7, one stage-0 trip
(kernel 11.7@2.07M + fine take 53.8) — but arithmetic only explains
~230 ms.  This isolates the XLA glue: compaction gathers/scatters,
nonzero, RR, and the while-loop trip count, plus candidate fixes
(packed-row compaction takes, plan variants).
"""

import sys

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
    from nrc_hpm_tpu.renderer import _volume_from_config
    from nrc_hpm_tpu.utils import rng

    print("device:", jax.devices()[0], flush=True)
    cfg = AppConfig()
    W, H = cfg.render_width, cfg.render_height
    N = W * H
    vol = _volume_from_config(cfg)
    cam = Camera.reference_camera(aspect=W / H)
    ro, rd, frag_uv = pixel_rays(cam, W, H)
    flat_rd = jnp.reshape(rd, (N, 3)).block_until_ready()
    flat_ro = jnp.broadcast_to(ro, flat_rd.shape)
    s0 = rng.init_state(frag_uv, jnp.asarray([0.1, 0.2, 0.3, 0.4]))
    s0 = s0.reshape(N)

    base = chain_timeit("delta @2.07M (production)",
                        lambda s, a, b: tr.delta_track_pw(s, vol, a, b),
                        s0, flat_ro, flat_rd, n=3)
    chain_timeit("delta @2.07M compact=False",
                 lambda s, a, b: tr.delta_track_pw(s, vol, a, b,
                                                   compact=False),
                 s0, flat_ro, flat_rd, n=3)

    # RR off
    old_rr = tr.RR_EPS
    tr.RR_EPS = 0.0
    chain_timeit("delta @2.07M RR off",
                 lambda s, a, b: tr.delta_track_pw(s, vol, a, b),
                 s0, flat_ro, flat_rd, n=3)
    tr.RR_EPS = old_rr

    # plan variants
    for plan, tag in [
        (((0.30, 16, 16), (0.10, 16, None)), "S=16 stage0"),
        (((0.30, 8, 8), (0.10, 16, None)), "stage0 8ev"),
        (((0.30, 8, 16), (0.04, 16, None)), "stage1 cap 0.04"),
        (((0.30, 8, 24), (0.06, 16, None)), "stage0 24ev"),
        (((0.27, 8, 16), (0.10, 16, None)), "cap 0.27"),
    ]:
        old = tr.DELTA_PLAN
        tr.DELTA_PLAN = plan
        chain_timeit(f"delta @2.07M {tag}",
                     lambda s, a, b: tr.delta_track_pw(s, vol, a, b),
                     s0, flat_ro, flat_rd, n=3)
        tr.DELTA_PLAN = old

    # ---- glue microbenches ----
    mask = jnp.asarray(np.random.rand(N) < 0.27)
    cap = int(N * 0.30)
    chain_timeit("nonzero(size=622k) @2.07M",
                 lambda m: jnp.nonzero(m, size=cap, fill_value=N)[0],
                 mask, n=3)
    (idx,) = jnp.nonzero(mask, size=cap, fill_value=N)
    arrs = [jnp.asarray(np.random.rand(N).astype(np.float32))
            for _ in range(9)]
    chain_timeit("take 9x 1-D @622k of 2.07M",
                 lambda i, *a: tuple(
                     jnp.take(x, i, axis=0, mode="fill", fill_value=0)
                     for x in a),
                 idx, *arrs, n=3)
    stacked = jnp.stack(arrs, axis=1)  # (N, 9)
    chain_timeit("take (N,9) rows @622k",
                 lambda i, a: jnp.take(a, i, axis=0, mode="fill",
                                       fill_value=0), idx, stacked, n=3)
    small = [jnp.take(a, idx) for a in arrs[:5]]
    chain_timeit("scatter-back 5x 1-D @622k",
                 lambda i, full, *sm: tuple(
                     f.at[i].set(s, mode="drop")
                     for f, s in zip(full, sm)),
                 idx, tuple(arrs[:5]), *small, n=3)

    # fine take at stage sizes
    lin0 = jnp.asarray(
        np.random.randint(0, 1600000, size=(8, cap)), jnp.int32)
    gf = vol.grid.reshape(-1)
    chain_timeit("fine take (8,622k)",
                 lambda l: jnp.take(gf, l, mode="fill", fill_value=0),
                 lin0, n=3)
    lin1 = jnp.asarray(
        np.random.randint(0, 1600000, size=(16, int(N * 0.10))), jnp.int32)
    chain_timeit("fine take (16,207k)",
                 lambda l: jnp.take(gf, l, mode="fill", fill_value=0),
                 lin1, n=3)


if __name__ == "__main__":
    main()
