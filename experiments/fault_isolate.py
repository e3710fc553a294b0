"""Isolate the TPU device fault seen on delta_track_pw at 2M lanes.

Run pieces in order, smallest first; each prints OK or dies.  Use
NRC_NO_PALLAS=1 to disable the macro-gather kernel.
"""

import os
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from experiments.timing import chain_timeit

WHICH = sys.argv[1] if len(sys.argv) > 1 else "all"


def run(tag, fn):
    if WHICH not in ("all", tag):
        return
    try:
        fn()
        print(f"{tag}: OK", flush=True)
    except Exception as e:
        print(f"{tag}: FAILED {str(e)[:200]}", flush=True)
        raise SystemExit(1)


def main():
    print("device:", jax.devices()[0],
          "NRC_NO_PALLAS=", os.environ.get("NRC_NO_PALLAS"), flush=True)
    N = 1 << 21

    def t_binsearch():
        cum = jnp.cumsum(
            jax.random.uniform(jax.random.PRNGKey(0), (32, N)), axis=0)
        E = jax.random.uniform(jax.random.PRNGKey(1), (16, N)) * 20.0

        def bs(E, cum):
            C = cum.shape[0]
            lo = jnp.zeros(E.shape, jnp.int32)
            hi = jnp.full(E.shape, C, jnp.int32)
            for _ in range(6):
                mid = (lo + hi) // 2
                cm = jnp.take_along_axis(cum, jnp.clip(mid, 0, C - 1),
                                         axis=0)
                right = cm <= E
                lo = jnp.where(right, mid + 1, lo)
                hi = jnp.where(right, hi, mid)
            return jnp.take_along_axis(cum, jnp.clip(hi, 0, C - 1), axis=0)

        chain_timeit("binsearch (16,2M)", bs, E, cum, n=2)

    run("binsearch", t_binsearch)

    def t_map_events():
        from nrc_hpm_tpu.transmittance import _map_events
        cum = jnp.cumsum(
            jax.random.uniform(jax.random.PRNGKey(0), (32, N)), axis=0)
        E = jax.random.uniform(jax.random.PRNGKey(1), (16, N)) * 20.0
        h = jnp.full((N,), 0.3)
        f = jnp.ones((32, N))
        chain_timeit("_map_events (16,2M)",
                     lambda E, cum, h, f: _map_events(E, cum, h, (f,))[0],
                     E, cum, h, f, n=2)

    run("map_events", t_map_events)

    def t_coarse():
        from nrc_hpm_tpu.transmittance import _coarse_profile
        from nrc_hpm_tpu.renderer import NrcRenderer
        from nrc_hpm_tpu.config import AppConfig
        r = NrcRenderer(AppConfig())
        ro = jnp.zeros((N, 3)) + jnp.asarray([64.0, 0, 0])
        rd = jnp.broadcast_to(jnp.asarray([-1.0, 0, 0]), (N, 3))
        tmax = jnp.full((N,), 100.0)
        chain_timeit("coarse_profile 2M",
                     lambda ro, rd, tmax, v: _coarse_profile(
                         v, ro, rd, tmax, 32)[0],
                     ro, rd, tmax, r.vol, n=2)

    run("coarse", t_coarse)

    def t_delta_small():
        from nrc_hpm_tpu.transmittance import delta_track_pw
        from nrc_hpm_tpu.renderer import NrcRenderer
        from nrc_hpm_tpu.config import AppConfig
        r = NrcRenderer(AppConfig())
        for n in (1 << 15, 1 << 18, 1 << 21):
            ro = jnp.zeros((n, 3)) + jnp.asarray([64.0, 0, 0])
            rd = jnp.broadcast_to(jnp.asarray([-1.0, 0, 0]), (n, 3))
            s0 = jnp.full((n,), 0.4, jnp.float32)
            chain_timeit(f"delta_pw {n}",
                         lambda s, o, d, v: delta_track_pw(s, v, o, d)[0],
                         s0, ro, rd, r.vol, n=2)

    run("delta", t_delta_small)


if __name__ == "__main__":
    main()
