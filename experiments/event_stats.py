"""Measure residual-event statistics on the real scene (scene 4, 1080p).

Decides the round-2 tracking redesign: how many piecewise-majorant residual
events does a lane actually need (rtot percentiles), what fraction of lanes
have any residual work at all, and what compaction would cost.
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from experiments.timing import chain_timeit


def main():
    print("device:", jax.devices()[0], flush=True)
    from nrc_hpm_tpu.camera import Camera, pixel_rays
    from nrc_hpm_tpu.config import AppConfig
    from nrc_hpm_tpu.renderer import NrcRenderer
    from nrc_hpm_tpu.transmittance import _coarse_profile, _track_seed
    from nrc_hpm_tpu.volume import find_entry_exit
    from nrc_hpm_tpu.utils import rng

    cfg = AppConfig()
    W, H = cfg.render_width, cfg.render_height
    N = W * H
    r = NrcRenderer(cfg)
    vol, lights = r.vol, r.lights
    cam = Camera.reference_camera(aspect=W / H)
    ro, rd, frag_uv = pixel_rays(cam, W, H)
    flat_rd = jnp.reshape(rd, (N, 3))
    flat_ro = jnp.broadcast_to(ro, flat_rd.shape)

    @jax.jit
    def stats(ro, rd):
        entry, exit_pt, hit = find_entry_exit(vol, ro, rd)
        tmax = jnp.linalg.norm(exit_pt - entry, axis=-1)
        tmax = jnp.where(hit, tmax, 0.0)
        d = rd
        sigma, c, ccum, rcum, h = _coarse_profile(vol, entry, d, tmax, 32)
        rtot = rcum[-1]
        ctot = ccum[-1]
        return hit, rtot, ctot

    hit, rtot, ctot = stats(flat_ro, flat_rd)
    hit = np.asarray(hit)
    rtot = np.asarray(rtot)
    ctot = np.asarray(ctot)
    print(f"box hit fraction: {hit.mean():.4f}")
    hr = rtot[hit]
    print(f"rtot>0 fraction (of all): {(rtot > 0).mean():.4f}")
    print(f"rtot>0 fraction (of hit): {(hr > 0).mean():.4f}")
    for q in (50, 75, 90, 95, 99, 99.9):
        print(f"rtot p{q}: {np.percentile(hr, q):.3f}")
    print(f"rtot mean (hit): {hr.mean():.3f}  max: {hr.max():.3f}")
    print(f"ctot mean (hit): {ctot[hit].mean():.3f}")
    # expected residual events per lane = rtot (Poisson rate)
    print(f"sum(rtot) over frame: {rtot.sum()/1e6:.2f} M expected events")

    # shadow-ray stats: from delta-track collision points toward dir light
    from nrc_hpm_tpu.transmittance import delta_track_pw
    s0 = rng.init_state(frag_uv, jnp.asarray([0.1, 0.2, 0.3, 0.4]))

    @jax.jit
    def shadow_stats(s, ro, rd):
        pos, exited, _ = delta_track_pw(s, vol, ro, rd)
        dl = lights.dir_light
        to_exit = -dl.direction / jnp.linalg.norm(dl.direction)
        d = jnp.broadcast_to(to_exit, pos.shape)
        _, exit_pt, _ = find_entry_exit(vol, pos, d)
        tmax = jnp.linalg.norm(exit_pt - pos, axis=-1)
        scat = ~exited
        tmax = jnp.where(scat, tmax, 0.0)
        sigma, c, ccum, rcum, h = _coarse_profile(vol, pos, d, tmax, 32)
        return scat, rcum[-1], ccum[-1]

    scat, srtot, sctot = shadow_stats(s0.reshape(N), flat_ro, flat_rd)
    scat = np.asarray(scat) & hit
    srtot = np.asarray(srtot)[scat]
    print(f"\nscattered fraction (of all): {scat.mean():.4f}")
    for q in (50, 90, 95, 99):
        print(f"shadow rtot p{q}: {np.percentile(srtot, q):.3f}")
    print(f"shadow rtot mean: {srtot.mean():.3f}")
    print(f"shadow sum(rtot): {np.asarray(srtot).sum()/1e6:.2f} M events")

    # compaction cost: gather k arrays of 600k from 2M
    idx = jnp.asarray(np.where(hit)[0][:524288].astype(np.int32))
    chain_timeit("take 524k of 2M f32 x1",
                 lambda a, i: jnp.take(a, i, axis=0), rtot, idx, n=3)
    a2 = jnp.stack([rtot] * 8, -1)
    chain_timeit("take 524k of 2M (N,8) x1",
                 lambda a, i: jnp.take(a, i, axis=0), a2, idx, n=3)
    prof = jnp.zeros((32, N), jnp.float32) + rtot[None]
    chain_timeit("take 524k cols of (32,2M)",
                 lambda a, i: jnp.take(a, i, axis=1), prof, idx, n=3)
    chain_timeit("nonzero(size=524k) of 2M",
                 lambda m: jnp.nonzero(m, size=524288, fill_value=N)[0],
                 rtot > 0, n=3)


if __name__ == "__main__":
    main()
