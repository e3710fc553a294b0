"""Phase function and direction sampling.

Replicates data/shader/include/dir_gen.glsl: the Henyey-Greenstein phase
function (:1-7), the GLSL column-major axis-angle rotation (:9-20 — note the
GLSL ``mat4`` constructor is column-major, so the matrix as written acts as
the TRANSPOSE of the standard Rodrigues matrix; we reproduce that exactly),
and ``NewRayDir`` (:22-64): rotate the previous direction away by either an
HG-inverse-CDF angle (phase sampling) or a uniform-in-[0,pi] angle (the
reference's biased "sphere" sampling, quirk SURVEY §2.6.6 — replicated), then
spin uniformly about the previous direction.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .utils import rng

PI = 3.14159265358979323846


def hg_phase(cos_theta: jax.Array, g: jax.Array) -> jax.Array:
    """hg_phase_func (dir_gen.glsl:1-7). Note the reference's normalization
    bakes the azimuthal 1/(2 pi) into the 0.5 factor."""
    g2 = g * g
    denom = 1.0 + g2 - 2.0 * g * cos_theta
    return 0.5 * (1.0 - g2) / jnp.power(jnp.maximum(denom, 1e-12), 1.5)


def _rotation_apply(axis: jax.Array, angle: jax.Array, v: jax.Array
                    ) -> jax.Array:
    """Apply the GLSL rotationMatrix(axis, angle) (dir_gen.glsl:9-20) to v.

    Because the GLSL mat4 constructor is column-major, the source-listed rows
    are columns; the effective matrix is the transpose of standard Rodrigues,
    i.e. a rotation by -angle about the axis. We apply exactly that:
        M^T v = cos*v + sin*(v x axis)... expanded explicitly below.
    """
    axis = axis / jnp.linalg.norm(axis, axis=-1, keepdims=True)
    s = jnp.sin(angle)[..., None]
    c = jnp.cos(angle)[..., None]
    oc = 1.0 - c
    a = axis
    # Standard Rodrigues: R v = v c + (a x v) s + a (a.v) oc
    # GLSL-as-written = R^T => rotation by -angle: flip the sine term.
    dot_av = jnp.sum(a * v, axis=-1, keepdims=True)
    cross_av = jnp.cross(a, v)
    return v * c - cross_av * s + a * dot_av * oc


def sample_hg_cos_theta(u: jax.Array, g: jax.Array) -> jax.Array:
    """Exact HG inverse-CDF cosine sampling (dir_gen.glsl:38-48)."""
    sqr_term = (1.0 - g * g) / (1.0 - g + 2.0 * g * u)
    cos_hg = (1.0 + g * g - sqr_term * sqr_term) / (2.0 * g)
    cos_iso = 1.0 - 2.0 * u
    use_iso = jnp.abs(g) < 1e-3
    return jnp.where(use_iso, cos_iso, cos_hg)


def new_ray_dir(state: jax.Array, old_dir: jax.Array, g,
                phase_sampling: bool, active=None):
    """NewRayDir (dir_gen.glsl:22-64).

    state: (...,) RNG state; old_dir: (..., 3) unit directions.
    ``phase_sampling`` is static; ``active`` masks RNG consumption per lane.
    Returns (new_dir, new_state) — two uniforms are consumed per active lane.
    """
    if active is None:
        active = jnp.ones(state.shape, bool)
    old_dir = old_dir / jnp.linalg.norm(old_dir, axis=-1, keepdims=True)

    # Any orthogonal vector (dir_gen.glsl:31-32). The reference divides by
    # zero when the branchless pick degenerates (e.g. old_dir == (-1, 0, 0));
    # we add a fallback to keep NaNs out of the pipeline (documented fix).
    cand = jnp.where(
        (old_dir[..., 2] < old_dir[..., 0])[..., None],
        jnp.stack([old_dir[..., 1], -old_dir[..., 0],
                   jnp.zeros_like(old_dir[..., 0])], axis=-1),
        jnp.stack([jnp.zeros_like(old_dir[..., 0]), -old_dir[..., 2],
                   old_dir[..., 1]], axis=-1))
    norm = jnp.linalg.norm(cand, axis=-1, keepdims=True)
    fallback = jnp.stack([-old_dir[..., 1], old_dir[..., 0],
                          jnp.zeros_like(old_dir[..., 0])], axis=-1)
    fb_norm = jnp.linalg.norm(fallback, axis=-1, keepdims=True)
    fallback2 = jnp.broadcast_to(
        jnp.asarray([1.0, 0.0, 0.0], cand.dtype), cand.shape)
    cand = jnp.where(norm > 1e-12, cand / jnp.maximum(norm, 1e-12),
                     jnp.where(fb_norm > 1e-12,
                               fallback / jnp.maximum(fb_norm, 1e-12),
                               fallback2))

    u1, state = rng.masked_uniform(state, active)
    if phase_sampling:
        cos_theta = jnp.clip(sample_hg_cos_theta(u1, g), -1.0, 1.0)
        angle = jnp.arccos(cos_theta)
    else:
        angle = u1 * PI
    d = _rotation_apply(cand, angle, old_dir)

    u2, state = rng.masked_uniform(state, active)
    d = _rotation_apply(old_dir, u2 * (2.0 * PI), d)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    return d, state


def dir_to_spherical_norm(d: jax.Array) -> jax.Array:
    """Direction -> normalized (theta, phi) NRC input features.

    theta follows the reference exactly: ``atan(z, x)/pi + 0.5``
    (prep_infer_rays.comp:13-14) — note this lands in [-0.5, 1.5], not
    [0, 1]; the hash encoding tolerates it and we keep the convention for
    parity.  phi diverges deliberately: the reference's
    ``acos(dir.y / length(dir.xz))`` (prep_infer_rays.comp:15) exceeds
    acos's domain for |y| > 0.707 and yields NaN network inputs; we use the
    well-defined elevation ``acos(clamp(dir.y, -1, 1))/pi`` in [0, 1]
    (documented fix, consistent across infer/train).
    """
    theta = jnp.arctan2(d[..., 2], d[..., 0])
    norm_theta = theta / PI + 0.5
    phi = jnp.arccos(jnp.clip(d[..., 1], -1.0, 1.0))
    norm_phi = phi / PI
    return jnp.stack([norm_theta, norm_phi], axis=-1)
