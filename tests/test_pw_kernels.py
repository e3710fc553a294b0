"""Unit tests for the Pallas tracking event kernel (interpret mode on CPU)
against the XLA reference machinery in transmittance.py."""

import jax
import jax.numpy as jnp
import numpy as np

from nrc_hpm_tpu import transmittance as tr
from nrc_hpm_tpu.ops.pw_kernels import pw_events
from nrc_hpm_tpu.volume import get_density_xyz


def _setup(small_volume, n=512, seed=3):
    vol = small_volume
    key = jax.random.PRNGKey(seed)
    k1, k2, k3 = jax.random.split(key, 3)
    start = jax.random.uniform(k1, (n, 3), minval=-3.0, maxval=3.0)
    d = jax.random.normal(k2, (n, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    tmax = jax.random.uniform(k3, (n,), minval=0.5, maxval=60.0)
    seed_u = jax.random.randint(key, (n,), 0, 1 << 30).astype(jnp.uint32)
    return vol, start, d, tmax, seed_u


def test_pw_events_matches_xla_machinery(small_volume):
    vol, start, d, tmax, seed_u = _setup(small_volume)
    n = tmax.shape[0]
    S = 8
    ev = pw_events(vol, start, d, tmax, seed_u, jnp.zeros((n,)), 0,
                   S=S, interpret=True)

    # profile totals vs the XLA coarse profile
    sigma, c, ccum, rcum, h = tr._coarse_profile(vol, start, d, tmax, 32)
    np.testing.assert_allclose(np.asarray(ev["rtot"]),
                               np.asarray(rcum[-1]), rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ev["ctot"]),
                               np.asarray(ccum[-1]), rtol=2e-5, atol=1e-6)

    # event draws + inversion vs the XLA body pieces
    u = tr._indexed_draws_lead(seed_u, jnp.uint32(0), S, salt=0x9E3779B9)
    E = jnp.cumsum(-jnp.log1p(-u), axis=0)
    t_ref, beyond_ref, (c_ref, s_ref) = tr._map_events(E, rcum, h,
                                                       (c, sigma))
    t_k = np.asarray(ev["t"])
    beyond_k = t_k < 0
    np.testing.assert_array_equal(beyond_k, np.asarray(beyond_ref))
    live = ~beyond_k
    np.testing.assert_allclose(t_k[live], np.asarray(t_ref)[live],
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ev["c_at"])[live],
                               np.asarray(c_ref)[live],
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(
        np.asarray(ev["sres"])[live],
        np.maximum(np.asarray(s_ref - c_ref), 1e-12)[live],
        rtol=1e-5, atol=1e-7)

    # density via lin index vs get_density_xyz at the event positions
    px = start[None, :, 0] + ev["t"] * d[None, :, 0]
    py = start[None, :, 1] + ev["t"] * d[None, :, 1]
    pz = start[None, :, 2] + ev["t"] * d[None, :, 2]
    dens_ref = np.asarray(get_density_xyz(vol, px, py, pz))
    grid_flat = vol.grid.reshape(-1)
    raw = jnp.take(grid_flat, ev["lin"], mode="fill", fill_value=0)
    dens_k = np.asarray(
        raw.astype(jnp.float32) / 255.0 * vol.density_factor)
    np.testing.assert_allclose(dens_k[live], dens_ref[live],
                               rtol=1e-6, atol=1e-7)

    # e_new continues the cumulative stream
    np.testing.assert_allclose(np.asarray(ev["e_new"]),
                               np.asarray(E[-1]), rtol=1e-5, atol=1e-6)


def test_pw_events_e_base_continues_stream(small_volume):
    vol, start, d, tmax, seed_u = _setup(small_volume, n=256, seed=9)
    n = tmax.shape[0]
    ev0 = pw_events(vol, start, d, tmax, seed_u, jnp.zeros((n,)), 0,
                    S=8, interpret=True)
    ev1 = pw_events(vol, start, d, tmax, seed_u, ev0["e_new"], 8,
                    S=8, interpret=True)
    # the 16-draw stream in one shot must equal the two 8-draw halves
    u = tr._indexed_draws_lead(seed_u, jnp.uint32(0), 16, salt=0x9E3779B9)
    E = jnp.cumsum(-jnp.log1p(-u), axis=0)
    np.testing.assert_allclose(np.asarray(ev1["e_new"]), np.asarray(E[-1]),
                               rtol=1e-5, atol=1e-5)


def test_pw_profile_matches_xla_profile_and_control(small_volume):
    """pw_profile (round-4 profile-only kernel): rtot/ctot match the XLA
    coarse profile and t_ctrl matches the XLA control-draw inversion."""
    from nrc_hpm_tpu.ops.pw_kernels import pw_profile

    vol, start, d, tmax, seed_u = _setup(small_volume, seed=5)
    prof = pw_profile(vol, start, d, tmax, seed_u, want_ctrl=True,
                      interpret=True)

    sigma, c, ccum, rcum, h = tr._coarse_profile(vol, start, d, tmax, 32)
    np.testing.assert_allclose(np.asarray(prof["rtot"]),
                               np.asarray(rcum[-1]), rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(prof["ctot"]),
                               np.asarray(ccum[-1]), rtol=2e-5, atol=1e-6)

    # control collision: same draw (salt 0x165667B1, index 0) inverted
    # through ccum
    e_ctrl = -jnp.log1p(-tr._indexed_draws_lead(
        seed_u, jnp.uint32(0), 1, salt=0x165667B1)[0])
    t_ref, beyond_ref, _ = tr._map_events(e_ctrl[None, :], ccum, h, ())
    ctrl_hit_ref = (~beyond_ref[0]) & (e_ctrl < ccum[-1])
    t_k = np.asarray(prof["t_ctrl"])
    hit_k = t_k < 1.0e37
    np.testing.assert_array_equal(hit_k, np.asarray(ctrl_hit_ref))
    np.testing.assert_allclose(t_k[hit_k], np.asarray(t_ref[0])[hit_k],
                               rtol=1e-4, atol=1e-5)
