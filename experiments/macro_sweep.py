"""Round-5 event-count attack (VERDICT r4 item 1a): how much residual
optical depth — i.e. how many fine-grid gathers — does a finer macrocell
majorant grid remove?

rtot = int (sigma_dil - c_ero) along each segment is the expected number
of residual events (Poisson rate); the frame's fine-gather count is
sum(rtot) over all lanes of all tracking calls.  This sweeps MACRO_CELL
over {8, 4, 2} and reports primary-chord and shadow-ray rtot sums on the
canonical scene-4 1080p view, CPU-computable (pure profile math, no
tracking).  The in-kernel cost side (the 8-row table sweep grows with
cells/128 rows: 4 / 27 / 204 tile-trips per lookup) is measured on TPU by
experiments/macro_kernel_bench.py.
"""

import importlib
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def build_volume(macro_cell: int):
    import nrc_hpm_tpu.volume as volume
    volume.MACRO_CELL = macro_cell
    from nrc_hpm_tpu.utils.vdb import load_vdb
    path = "/root/reference/data/volume/wdas_cloud_sixteenth.vdb"
    data = load_vdb(path).data
    return volume.Volume.from_dense(data, 0.6, 0.8), volume


def main():
    from nrc_hpm_tpu.camera import Camera, pixel_rays
    from nrc_hpm_tpu.config import AppConfig
    from nrc_hpm_tpu.lights import lights_from_scene
    from nrc_hpm_tpu.utils import rng

    cfg = AppConfig()
    W, H = cfg.render_width, cfg.render_height
    N = W * H
    cam = Camera.reference_camera(aspect=W / H)
    ro, rd, frag_uv = pixel_rays(cam, W, H)
    flat_rd = jnp.reshape(rd, (N, 3))
    flat_ro = jnp.broadcast_to(ro, flat_rd.shape)
    lights = lights_from_scene(AppConfig().scene)
    dl_dir = None
    if lights.dir_light is not None:
        d = np.asarray(lights.dir_light.direction)
        dl_dir = -d / np.linalg.norm(d)

    # fixed scatter points for the shadow-ray measurement: delta-track once
    # at the DEFAULT macro cell, reuse the points for every variant so the
    # comparison holds the workload constant
    vol0, volume = build_volume(8)
    from nrc_hpm_tpu.transmittance import _coarse_profile, delta_track_pw
    s0 = rng.init_state(frag_uv, jnp.asarray([0.1, 0.2, 0.3, 0.4]))
    pos, exited, _ = jax.jit(
        lambda s, a, b: delta_track_pw(s, vol0, a, b))(
        s0.reshape(N), flat_ro, flat_rd)
    scat = np.asarray(~exited)
    pos = jax.device_get(pos)

    from nrc_hpm_tpu.volume import find_entry_exit

    for mc in (8, 4, 2):
        vol, volume = build_volume(mc)

        @jax.jit
        def stats(ro, rd, active):
            entry, exit_pt, hit = find_entry_exit(vol, ro, rd)
            hit = hit & active
            tmax = jnp.linalg.norm(exit_pt - entry, axis=-1)
            tmax = jnp.where(hit, tmax, 0.0)
            sigma, c, ccum, rcum, h = _coarse_profile(vol, entry, rd,
                                                      tmax, 32)
            return hit, rcum[-1], ccum[-1]

        hit, rtot, ctot = stats(flat_ro, flat_rd,
                                jnp.ones((N,), bool))
        hit = np.asarray(hit)
        rtot = np.asarray(rtot)
        hr = rtot[hit]
        line = (f"MACRO_CELL={mc}: primary sum(rtot)={rtot.sum()/1e6:.3f}M"
                f" mean(hit)={hr.mean():.2f} p50={np.percentile(hr,50):.1f}"
                f" p90={np.percentile(hr,90):.1f}"
                f" p99={np.percentile(hr,99):.1f}")
        if dl_dir is not None:
            sdir = jnp.broadcast_to(jnp.asarray(dl_dir), (N, 3))
            shit, srtot, _ = stats(jnp.asarray(pos), sdir,
                                   jnp.asarray(scat))
            sr = np.asarray(srtot)
            line += (f" | shadow sum(rtot)={sr.sum()/1e6:.3f}M"
                     f" mean(scat)={sr[np.asarray(shit)].mean():.2f}")
        print(line, flush=True)


if __name__ == "__main__":
    main()
