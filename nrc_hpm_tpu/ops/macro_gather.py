"""Pallas TPU kernel: random lookups into a small (macrocell) table.

XLA lowers arbitrary gathers on TPU to a ~0.1 elem/cycle scalar path — the
measured ceiling is ~130M lookups/s, which made the tracking loops gather-
bound (see experiments/gather_bench.py).  For the ~3.5k-entry macrocell
majorant grid we can do far better: the whole table fits in a handful of
(8, 128) VMEM tiles, so each block of lookups is served by R unrolled
lane-dim ``take_along_axis`` ops (the one gather form Mosaic lowers to the
hardware's in-register dynamic gather) plus row-mask selects — pure VPU
work, no scalar loop.

Fallback: plain jnp.take on CPU/interpret or when the table exceeds
MAX_ROWS.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
MAX_ROWS = 64          # tables up to 8192 entries
BLOCK_ROWS = 256       # lookups per program: BLOCK_ROWS x 128


def _kernel(tbl_ref, idx_ref, out_ref, *, n_rows: int):
    idx = idx_ref[...]
    r = idx // LANES
    c = idx % LANES
    t = tbl_ref[...]
    acc = jnp.zeros(idx.shape, jnp.float32)
    for row in range(n_rows):
        rowv = jnp.broadcast_to(t[row][None, :], idx.shape)
        picked = jnp.take_along_axis(rowv, c, axis=1)
        acc = jnp.where(r == row, picked, acc)
    out_ref[...] = acc


@functools.partial(jax.jit, static_argnames=("n_rows",))
def _pallas_lookup(table2d: jax.Array, idx2d: jax.Array, n_rows: int):
    m = idx2d.shape[0]
    grid = (m // BLOCK_ROWS,)
    return pl.pallas_call(
        functools.partial(_kernel, n_rows=n_rows),
        out_shape=jax.ShapeDtypeStruct(idx2d.shape, jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((table2d.shape[0], LANES), lambda g: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_ROWS, LANES), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BLOCK_ROWS, LANES), lambda g: (g, 0),
                               memory_space=pltpu.VMEM),
    )(table2d, idx2d)


def small_table_lookup(table: jax.Array, idx: jax.Array) -> jax.Array:
    """table: (T,) float32 with T <= MAX_ROWS*128; idx: (...,) int32 in
    [0, T). Returns table[idx] as float32.

    Uses the Pallas kernel on TPU; falls back to jnp.take elsewhere."""
    import os
    use_kernel = (jax.default_backend() == "tpu"
                  and table.shape[0] <= MAX_ROWS * LANES
                  and not os.environ.get("NRC_NO_PALLAS"))
    if not use_kernel:
        return jnp.take(table, idx, axis=0)

    n_rows = -(-table.shape[0] // LANES)
    pad_t = n_rows * LANES - table.shape[0]
    t2 = jnp.pad(table, (0, pad_t)).reshape(n_rows, LANES)

    shape = idx.shape
    flat = idx.reshape(-1)
    n = flat.shape[0]
    block = BLOCK_ROWS * LANES
    pad_n = (-n) % block
    if pad_n:
        flat = jnp.pad(flat, (0, pad_n))
    out = _pallas_lookup(t2, flat.reshape(-1, LANES), n_rows)
    return out.reshape(-1)[:n].reshape(shape)
