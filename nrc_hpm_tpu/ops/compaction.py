"""Lane compaction: run a function on only the mask-selected lanes.

The TPU analog of not launching warps for dead pixels (the reference's
shaders simply branch per thread; on TPU dead lanes still burn VPU cycles
and — much worse — density-gather slots, so cost must be removed by
reshaping work to the live-lane count).  Used at three levels:

- whole-pass compaction (renderer.py: trace only box-hitting rays, encode
  only scattered pixels),
- per-bounce compaction inside the path-trace loop (integrator.py: after a
  couple of bounces most lanes have exited the volume),
- per-segment compaction inside the piecewise tracking event loops
  (transmittance.py: lanes resolve after ~rtot events; the p99 tail must
  not keep the whole batch gathering).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def compact_apply(fn, mask, arrays, out_shapes, capacity: int,
                  dense_fn=None):
    """Run ``fn`` on only the mask-selected lanes (compacted to a static
    ``capacity``), scattering results back to full size (zeros elsewhere).

    If more than ``capacity`` lanes are live, falls back to the dense call
    via lax.cond (both branches are compiled; one executes).

    fn(*compacted_arrays) -> tuple of (capacity, ...) arrays.
    out_shapes: list of trailing shapes for the outputs (() for scalar
    per-lane outputs).
    Returns the tuple of full-size outputs.
    """
    n = mask.shape[0]
    count = jnp.sum(mask)
    (idx,) = jnp.nonzero(mask, size=capacity, fill_value=n)

    def compact_branch(args):
        gathered = [jnp.take(a, idx, axis=0, mode="fill", fill_value=0)
                    for a in args]
        outs = fn(*gathered)
        full = []
        for o, tail in zip(outs, out_shapes):
            buf = jnp.zeros((n,) + tuple(tail), o.dtype)
            # out-of-range fill indices are dropped by the scatter
            full.append(buf.at[idx].set(o, mode="drop"))
        return tuple(full)

    def dense_branch(args):
        outs = (dense_fn or fn)(*args)
        return tuple(jnp.where(
            mask.reshape((n,) + (1,) * len(tail)) if tail else mask,
            o, jnp.zeros_like(o))
            for o, tail in zip(outs, out_shapes))

    return jax.lax.cond(count <= capacity, compact_branch, dense_branch,
                        tuple(arrays))


def compact_update(fn, mask, arrays, capacity: int):
    """Like compact_apply, but for UPDATE semantics: ``fn`` maps the
    compacted arrays to updated versions of the SAME arrays; unselected
    lanes keep their original values (instead of zeros).  Falls back to a
    dense masked update when more than ``capacity`` lanes are selected.

    fn(*compacted) -> tuple of updated compacted arrays (same shapes).
    Returns the tuple of updated full-size arrays.
    """
    n = mask.shape[0]
    count = jnp.sum(mask)
    (idx,) = jnp.nonzero(mask, size=capacity, fill_value=n)

    def compact_branch(args):
        gathered = [jnp.take(a, idx, axis=0, mode="fill", fill_value=0)
                    for a in args]
        outs = fn(*gathered)
        return tuple(a.at[idx].set(o, mode="drop")
                     for a, o in zip(args, outs))

    def dense_branch(args):
        outs = fn(*args)
        return tuple(jnp.where(
            mask.reshape((n,) + (1,) * (a.ndim - 1)), o, a)
            for a, o in zip(args, outs))

    return jax.lax.cond(count <= capacity, compact_branch, dense_branch,
                        tuple(arrays))
