"""Bisect one delta_track_pw while-iteration body at moderate lane counts.

Each chain_timeit is a separate small execution (avoid the tunnel's
long-program kill).  Run: python experiments/body_bisect.py [N_log2]
"""

import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from experiments.timing import chain_timeit

NLOG = int(sys.argv[1]) if len(sys.argv) > 1 else 19


def main():
    print("device:", jax.devices()[0], flush=True)
    from nrc_hpm_tpu.camera import Camera, pixel_rays
    from nrc_hpm_tpu.config import AppConfig
    from nrc_hpm_tpu.renderer import NrcRenderer
    from nrc_hpm_tpu.transmittance import (_coarse_profile, _map_events,
                                           _indexed_draws_lead, _track_seed)
    from nrc_hpm_tpu.volume import get_density_xyz
    from nrc_hpm_tpu.utils import rng

    cfg = AppConfig()
    r = NrcRenderer(cfg)
    vol = r.vol
    N = 1 << NLOG
    W = 1920
    H = max(8, N // W)
    N = W * H
    print(f"N = {N}", flush=True)
    ro, rd, frag_uv = pixel_rays(Camera.reference_camera(aspect=W / H), W, H)
    ro = jnp.broadcast_to(ro, (N, 3))
    rd = jnp.reshape(rd, (N, 3))
    s0 = rng.init_state(frag_uv, jnp.asarray([.1, .2, .3, .4])).reshape(N)

    from nrc_hpm_tpu.volume import find_entry_exit
    _, exit_pt, _ = find_entry_exit(vol, ro, rd)
    tmax = jnp.linalg.norm(exit_pt - ro, axis=-1)
    seed = jax.lax.bitcast_convert_type(s0, jnp.uint32)

    S = 16

    chain_timeit("coarse_profile", lambda ro, rd, tmax, v:
                 _coarse_profile(v, ro, rd, tmax, 32)[3], ro, rd, tmax, vol,
                 n=2)
    sigma, c, ccum, rcum, h = jax.jit(
        lambda ro, rd, tmax: _coarse_profile(vol, ro, rd, tmax, 32))(
        ro, rd, tmax)

    chain_timeit("draws 2x(16,N)", lambda h, seed:
                 _indexed_draws_lead(seed, jnp.uint32(0), S, 0x85EBCA6B)
                 + h[None, :] * 0, h, seed, n=2)
    u1 = jax.jit(lambda seed: _indexed_draws_lead(
        seed, jnp.uint32(0), S, 0x85EBCA6B))(seed)

    chain_timeit("cumsum (16,N)", lambda u:
                 jnp.cumsum(-jnp.log1p(-u), axis=0), u1, n=2)
    E = jnp.cumsum(-jnp.log1p(-u1 * 0.999), axis=0)

    chain_timeit("map_events (16,N)", lambda E, rcum, h:
                 _map_events(E, rcum, h, (c, sigma))[0], E, rcum, h, n=2)
    t, beyond, (c_at, s_at) = jax.jit(
        lambda E, rcum, h: _map_events(E, rcum, h, (c, sigma)))(E, rcum, h)

    def positions(t, ro, rd):
        px = ro[None, :, 0] + t * rd[None, :, 0]
        py = ro[None, :, 1] + t * rd[None, :, 1]
        pz = ro[None, :, 2] + t * rd[None, :, 2]
        return px, py, pz

    chain_timeit("positions (16,N)", lambda t, ro, rd:
                 positions(t, ro, rd)[0], t, ro, rd, n=2)
    px, py, pz = jax.jit(positions)(t, ro, rd)

    chain_timeit("density_xyz (16,N)", lambda px, py, pz, v:
                 get_density_xyz(v, px, py, pz), px, py, pz, vol, n=2)
    dens = jax.jit(lambda px, py, pz: get_density_xyz(vol, px, py, pz))(
        px, py, pz)

    def resolve(dens, c_at, s_at, t):
        u2 = u1
        sres = jnp.maximum(s_at - c_at, 1e-12)
        accept = ~beyond & (jnp.clip(dens - c_at, 0.0, None) / sres > u2)
        event = accept | beyond
        first = jnp.argmax(event, axis=0)
        has_event = jnp.any(event, axis=0)
        ev_accept = jnp.take_along_axis(accept, first[None, :], axis=0)[0]
        ev_t = jnp.take_along_axis(t, first[None, :], axis=0)[0]
        return ev_accept, ev_t, has_event

    chain_timeit("resolve (16,N)", lambda d, c_at, s_at, t:
                 resolve(d, c_at, s_at, t)[1], dens, c_at, s_at, t, n=2)

    # whole body fused once (fori_loop x1 / x4 to see loop scaling)
    from nrc_hpm_tpu.transmittance import delta_track_pw

    def delta_n_segments(max_steps):
        def f(s, o, d, v):
            return delta_track_pw(s, v, o, d, max_steps=max_steps)[0]
        return f

    chain_timeit("delta_pw 1 seg (16 steps)", delta_n_segments(16),
                 s0, ro, rd, vol, n=2)
    chain_timeit("delta_pw 2 seg", delta_n_segments(32),
                 s0, ro, rd, vol, n=2)
    chain_timeit("delta_pw 8 seg (full)", delta_n_segments(128),
                 s0, ro, rd, vol, n=2)


if __name__ == "__main__":
    main()
