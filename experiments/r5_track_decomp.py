"""Round-5 tracking decomposition on the real TPU.

Establishes where the tracking calls' time goes, to size two candidate
redesigns (VERDICT r4 item 1):
  (a) profile-once: the event kernel re-runs the full macro-table sweep
      profile on EVERY segment trip; handing the packed per-interval
      profile through HBM would pay the sweep once per stage;
  (b) MACRO_CELL=4: -38% primary / -28% shadow residual events
      (experiments/macro_sweep.py) at 27 vs 4 sweep tile-trips/lookup.

Measures, chain-timed at the canonical 1080p scene-4 workload:
  delta_track_pw @2.07M            the production primary-bounce call
  ratio 2x497k shadow              the production batched scene call
  pw_profile(ctrl) @2.07M          one profile pass, MC=8 vs MC=4
  pw_events 1 trip @2.07M S=8      one event trip,  MC=8 vs MC=4
  fine take (8,2.07M)              XLA gather from the 1.7M-voxel grid:
                                   u8 vs f32 vs u32-packed-430k tables
  delta_track_pw @2.07M MC=4       whole call at the finer macro grid
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


def build_volume(macro_cell: int):
    import nrc_hpm_tpu.volume as volume
    old = volume.MACRO_CELL
    volume.MACRO_CELL = macro_cell
    from nrc_hpm_tpu.utils.vdb import load_vdb
    data = load_vdb(
        "/root/reference/data/volume/wdas_cloud_sixteenth.vdb").data
    v = volume.Volume.from_dense(data, 0.6, 0.8)
    volume.MACRO_CELL = old
    return v


def main():
    from nrc_hpm_tpu.camera import Camera, pixel_rays
    from nrc_hpm_tpu.config import AppConfig
    from nrc_hpm_tpu.lights import lights_from_scene
    from nrc_hpm_tpu.transmittance import (delta_track_pw, ratio_track_pw,
                                           _track_seed)
    from nrc_hpm_tpu.ops.pw_kernels import pw_events, pw_profile
    from nrc_hpm_tpu.utils import rng
    import nrc_hpm_tpu.volume as volume

    print("device:", jax.devices()[0], flush=True)
    cfg = AppConfig()
    W, H = cfg.render_width, cfg.render_height
    N = W * H
    vol8 = build_volume(8)
    vol4 = build_volume(4)
    print(f"macro rows: MC8={-(-vol8.macro_packed.shape[0]//128)} "
          f"MC4={-(-vol4.macro_packed.shape[0]//128)}", flush=True)
    lights = lights_from_scene(cfg.scene)

    cam = Camera.reference_camera(aspect=W / H)
    ro, rd, frag_uv = pixel_rays(cam, W, H)
    flat_rd = jnp.reshape(rd, (N, 3)).block_until_ready()
    flat_ro = jnp.broadcast_to(ro, flat_rd.shape)
    s0 = rng.init_state(frag_uv, jnp.asarray([0.1, 0.2, 0.3, 0.4]))
    s0 = s0.reshape(N)

    # ---- production calls (MC=8) ----
    dt_delta8 = chain_timeit(
        "delta_track_pw @2.07M MC=8",
        lambda s, a, b: delta_track_pw(s, vol8, a, b),
        s0, flat_ro, flat_rd, n=3)

    # scatter points for shadow-like ratio workload
    pos, exited, _ = jax.jit(
        lambda s, a, b: delta_track_pw(s, vol8, a, b))(s0, flat_ro, flat_rd)
    scat = ~exited
    cap = 995328  # 2 x 497664 = 2 x 0.24*N  (scene_compact cap)
    (idx,) = jnp.nonzero(np.asarray(scat), size=cap // 2, fill_value=N)
    spos = jnp.take(pos, idx, axis=0, mode="fill", fill_value=0)
    dl = lights.dir_light
    to_exit = -dl.direction / jnp.linalg.norm(dl.direction)
    sdir = jnp.broadcast_to(to_exit, spos.shape)
    from nrc_hpm_tpu.volume import find_entry_exit
    _, sexit, _ = find_entry_exit(vol8, spos, sdir)
    spos2 = jnp.concatenate([spos, spos], axis=0)
    send2 = jnp.concatenate([sexit, sexit], axis=0)
    sst2 = jnp.concatenate([s0[:cap // 2], s0[:cap // 2]], axis=0)

    dt_ratio8 = chain_timeit(
        "ratio_track_pw @995k shadow MC=8",
        lambda s, a, b: ratio_track_pw(s, vol8, a, b),
        sst2, spos2, send2, n=3)

    # ---- kernel pieces ----
    seed, _ = _track_seed(s0)
    _, exit_pt, _ = find_entry_exit(vol8, flat_ro, flat_rd)
    tmax = jnp.linalg.norm(exit_pt - flat_ro, axis=-1)
    e_last = jnp.zeros((N,), jnp.float32)

    for tag, vol in (("MC=8", vol8), ("MC=4", vol4)):
        chain_timeit(
            f"pw_profile(ctrl) @2.07M {tag}",
            lambda sd, a, b, t, v=vol: pw_profile(v, a, b, t, sd,
                                                  want_ctrl=True),
            seed, flat_ro, flat_rd, tmax, n=3)
        chain_timeit(
            f"pw_events 1 trip S=8 @2.07M {tag}",
            lambda sd, a, b, t, el, v=vol: pw_events(v, a, b, t, sd, el, 0,
                                                     S=8),
            seed, flat_ro, flat_rd, tmax, e_last, n=3)

    # ---- fine-grid gather rate vs table form ----
    ev = jax.jit(lambda sd, a, b, t, el: pw_events(vol8, a, b, t, sd, el, 0,
                                                   S=8))(
        seed, flat_ro, flat_rd, tmax, e_last)
    lin = jnp.clip(ev["lin"], 0)  # (8, N) realistic event indices
    grid_flat_u8 = vol8.grid.reshape(-1)
    grid_flat_f32 = grid_flat_u8.astype(jnp.float32)
    X, Y, Z = vol8.dims
    Zw = -(-Z // 4)
    g = np.asarray(vol8.grid)
    gp = np.zeros((X, Y, Zw * 4), np.uint8)
    gp[:, :, :Z] = g
    packed = (gp[:, :, 0::4].astype(np.uint32)
              | (gp[:, :, 1::4].astype(np.uint32) << 8)
              | (gp[:, :, 2::4].astype(np.uint32) << 16)
              | (gp[:, :, 3::4].astype(np.uint32) << 24))
    packed = jnp.asarray(packed.reshape(-1))  # (X*Y*Zw,) u32

    chain_timeit("fine take (8,2.07M) u8 grid",
                 lambda l: jnp.take(grid_flat_u8, l, mode="fill",
                                    fill_value=0), lin, n=3)
    chain_timeit("fine take (8,2.07M) f32 grid",
                 lambda l: jnp.take(grid_flat_f32, l, mode="fill",
                                    fill_value=0), lin, n=3)

    def packed_take(l):
        # l indexes [x,y,z] linear; word index + byte select
        z = l % Z
        xy = l // Z
        w = jnp.take(packed, xy * Zw + z // 4, mode="fill", fill_value=0)
        sh = (z % 4) * 8
        return ((w >> sh) & 0xFF).astype(jnp.float32)

    chain_timeit("fine take (8,2.07M) u32-packed/4",
                 packed_take, lin, n=3)

    # ---- whole delta at MC=4 ----
    dt_delta4 = chain_timeit(
        "delta_track_pw @2.07M MC=4",
        lambda s, a, b: delta_track_pw(s, vol4, a, b),
        s0, flat_ro, flat_rd, n=3)
    dt_ratio4 = chain_timeit(
        "ratio_track_pw @995k shadow MC=4",
        lambda s, a, b: ratio_track_pw(s, vol4, a, b),
        sst2, spos2, send2, n=3)
    print(f"\ndelta MC4/MC8: {dt_delta4/dt_delta8:.3f}   "
          f"ratio MC4/MC8: {dt_ratio4/dt_ratio8:.3f}", flush=True)


if __name__ == "__main__":
    main()
