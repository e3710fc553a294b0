"""Round-5: how much of delta/ratio goes to the unresolved TAIL?

Suspicion from r5_delta_decomp: the stage-1 while loop (events 16..128 at
cap 0.10 = 207k lanes) burns up to 7 trips x ~25 ms whenever ANY lane has
rtot beyond the stage budget.  Measures max_steps sweeps (the tail-trip
cost directly), a 3-stage plan (tiny third cap for events 48+), and the
packed-row scatter rate for the compaction glue.
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
    from nrc_hpm_tpu.volume import find_entry_exit

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

    # rtot tail statistics (how many lanes are beyond each event budget)
    from nrc_hpm_tpu.transmittance import _coarse_profile
    entry, exit_pt, hit = find_entry_exit(vol, flat_ro, flat_rd)
    tmax = jnp.where(hit, jnp.linalg.norm(exit_pt - flat_ro, axis=-1), 0.0)
    _, _, _, rcum, _ = jax.jit(
        lambda a, b, t: _coarse_profile(vol, a, b, t, 32))(
        flat_ro, flat_rd, tmax)
    rtot = np.asarray(rcum[-1])
    print(f"rtot: max={rtot.max():.1f}  "
          f"lanes>16: {(rtot>16).sum()}  >32: {(rtot>32).sum()}  "
          f">48: {(rtot>48).sum()}  >64: {(rtot>64).sum()}  "
          f">96: {(rtot>96).sum()}  >128: {(rtot>128).sum()}", flush=True)

    for ms in (32, 48, 64, 128):
        chain_timeit(f"delta @2.07M max_steps={ms}",
                     lambda s, a, b, ms=ms: tr.delta_track_pw(
                         s, vol, a, b, max_steps=ms),
                     s0, flat_ro, flat_rd, n=3)

    # 3-stage plan: tiny third cap for the 48+ event tail
    old = tr.DELTA_PLAN
    for plan, tag in [
        (((0.30, 8, 16), (0.10, 16, 32), (0.02, 16, None)), "3stage 0.02"),
        (((0.30, 8, 16), (0.10, 16, 48), (0.01, 16, None)), "3stage 0.01@48"),
    ]:
        tr.DELTA_PLAN = plan
        chain_timeit(f"delta @2.07M {tag}",
                     lambda s, a, b: tr.delta_track_pw(s, vol, a, b),
                     s0, flat_ro, flat_rd, n=3)
        tr.DELTA_PLAN = old

    # packed-row scatter rate (counterpart of the 4x-faster row take)
    cap = int(N * 0.30)
    mask = jnp.asarray(np.random.rand(N) < 0.27)
    (idx,) = jnp.nonzero(mask, size=cap, fill_value=N)
    stacked = jnp.asarray(np.random.rand(N, 9).astype(np.float32))
    rows = jnp.take(stacked, idx, axis=0, mode="fill", fill_value=0)
    chain_timeit("scatter rows (N,9) @622k",
                 lambda i, full, r: full.at[i].set(r, mode="drop"),
                 idx, stacked, rows, n=3)
    arrs5 = [jnp.asarray(np.random.rand(N).astype(np.float32))
             for _ in range(5)]
    sm5 = [jnp.take(a, idx) for a in arrs5]
    chain_timeit("scatter 9x 1-D @622k",
                 lambda i, full, *sm: tuple(
                     f.at[i].set(s, mode="drop")
                     for f, s in zip(full, sm)),
                 idx, tuple(arrs5 + arrs5[:4]),
                 *(sm5 + sm5[:4]), n=3)

    # fold-only bound: stage-0 trip with the fine take replaced by const
    seed, _ = tr._track_seed(s0)


if __name__ == "__main__":
    main()
