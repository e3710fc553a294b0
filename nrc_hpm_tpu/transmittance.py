"""Stochastic transmittance estimators: delta tracking and ratio tracking.

Replicates data/shader/include/path_trace.glsl as fixed-trip-count masked
loops — the TPU-idiomatic form of the reference's data-dependent ``for``
loops, which already carry a hard 128-iteration cap (path_trace.glsl:34,161).
Per-lane RNG consumption is masked so each lane draws exactly as many
uniforms as the corresponding GLSL thread would, including the reference's
quirk of consuming one extra uniform on volume exit (the unconditional
fallthrough ``return rayOrigin + RandFloat(tMax)*rayDir`` at
path_trace.glsl:173 executes on loop break as well, and gen_rays.comp:24
actually USES that random fallback point as the NRC query position when a
scattered path later exits the volume — so we reproduce it faithfully).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .utils import rng
from .volume import Volume, find_entry_exit, get_density


def fixed_step_transmittance(vol: Volume, start: jax.Array, end: jax.Array,
                             count: int) -> jax.Array:
    """GetTransmittance (path_trace.glsl:1-22): deterministic ``count``-step
    Riemann product with samples at the LEFT endpoints (factor i/count)."""
    d = end - start
    seg_len = jnp.linalg.norm(d, axis=-1)
    step = seg_len / count
    # sample points at fractions i/count, i in [0, count)
    fracs = jnp.arange(count, dtype=jnp.float32) / count
    pts = start[..., None, :] + fracs[:, None] * d[..., None, :]
    dens = get_density(vol, pts)
    trans = jnp.exp(-jnp.sum(dens, axis=-1) * step)
    return jnp.where(step == 0.0, 1.0, trans)


def ratio_track(state: jax.Array, vol: Volume, start: jax.Array,
                end: jax.Array, max_steps: int = 128,
                active=None):
    """RatioTrack (path_trace.glsl:24-43): unbiased residual-ratio
    transmittance along [start, end] with majorant = density_factor.

    start/end: (..., 3). Returns (transmittance, new_state).
    """
    if active is None:
        active = jnp.ones(state.shape, bool)
    inv_max = 1.0 / vol.density_factor
    seg = end - start
    tmax = jnp.linalg.norm(seg, axis=-1)
    direction = seg / jnp.maximum(tmax, 1e-12)[..., None]

    def body(_, carry):
        t, trans, state, done = carry
        lane = active & ~done
        u, state = rng.masked_uniform(state, lane)
        t_new = t - jnp.log(1.0 - u) * inv_max
        exited = t_new >= tmax
        pos = start + t_new[..., None] * direction
        dens = get_density(vol, pos)
        apply = lane & ~exited
        trans = jnp.where(apply, trans * (1.0 - dens * inv_max), trans)
        t = jnp.where(lane, t_new, t)
        done = done | (lane & exited)
        return t, trans, state, done

    t0 = jnp.zeros_like(tmax)
    trans0 = jnp.ones_like(tmax)
    done0 = jnp.zeros(tmax.shape, bool)
    _, trans, state, _ = jax.lax.fori_loop(
        0, max_steps, body, (t0, trans0, state, done0))
    return trans, state


def delta_track(state: jax.Array, vol: Volume, ro: jax.Array, rd: jax.Array,
                max_steps: int = 128, active=None):
    """DeltaTrack (path_trace.glsl:150-174): Woodcock collision sampling to
    the box exit.

    Returns (pos, volume_exit, new_state):
      - collision lanes: pos = the sampled real-collision point,
      - exit/exhausted lanes: pos = uniformly random point on [ro, exit)
        (the reference's fallthrough return), volume_exit True only for
        lanes whose free-flight jumped past the exit.
    """
    if active is None:
        active = jnp.ones(state.shape, bool)
    inv_max = 1.0 / vol.density_factor
    _, exit_pt, _ = find_entry_exit(vol, ro, rd)
    tmax = jnp.linalg.norm(exit_pt - ro, axis=-1)

    def body(_, carry):
        t, pos, hit, exited, state = carry
        lane = active & ~hit & ~exited
        u1, state = rng.masked_uniform(state, lane)
        t_new = jnp.where(lane, t - jnp.log(1.0 - u1) * inv_max, t)
        exit_now = lane & (t_new >= tmax)
        probe = lane & ~exit_now
        u2, state = rng.masked_uniform(state, probe)
        cand = ro + t_new[..., None] * rd
        dens = get_density(vol, cand)
        hit_now = probe & (dens * inv_max > u2)
        pos = jnp.where(hit_now[..., None], cand, pos)
        return (t_new, pos, hit | hit_now, exited | exit_now, state)

    t0 = jnp.zeros_like(tmax)
    pos0 = jnp.zeros_like(ro)
    f0 = jnp.zeros(tmax.shape, bool)
    _, pos, hit, exited, state = jax.lax.fori_loop(
        0, max_steps, body, (t0, pos0, f0, f0, state))

    # Fallthrough: every non-collision lane consumes one more uniform and
    # yields a random point along the segment (path_trace.glsl:173).
    fall_lane = active & ~hit
    u3, state = rng.masked_uniform(state, fall_lane)
    fallback = ro + (u3 * tmax)[..., None] * rd
    pos = jnp.where(hit[..., None], pos, fallback)
    return pos, exited, state
