"""Pallas TPU kernel: random lookups into small/medium tables (row-sweep).

TPU background (measured, experiments/gather2_bench.py): XLA lowers random
gathers to a scalar path issuing ~1 lookup / 7.5 cycles (~126M/s) REGARDLESS
of fetch width or table residency, so gather-bound code cannot be fixed by
VMEM residency alone.  The one vector-rate primitive Mosaic offers is the
in-register per-lane gather (``take_along_axis`` over a 128-lane window).
This kernel serves a whole table by sweeping its (R, 128) rows through that
window: R compare+pick+select passes over each lookup block — pure VPU work
at ~860M lookups/s for R=32 and ~760M/s for R=128.

Cost scales like O(N * R), so this wins over XLA's take only for tables up
to ~64k entries; callers with bigger tables (the 1.7M-voxel fine density
grid) must reduce LOOKUP COUNT instead (see transmittance.py's compacted
event loops).

Used by:
- the 3.5k-entry macrocell majorant/control tables (volume.py) — packed as
  bf16 pairs so one lookup serves both fields;
- the hash-grid encoding at the TPU-default ``log2_hashmap_size`` (14),
  where every level table is rowsweep-servable (encoding.py).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
MAX_ROWS = 512          # tables up to 65,536 entries
BLOCK_ROWS = 256        # lookups per program: BLOCK_ROWS x 128
UNROLL_ROWS = 64        # python-unroll threshold (small tables)


def _kernel(tbl_ref, idx_ref, out_ref, *, n_rows: int):
    idx = idx_ref[...]
    r = idx // LANES
    c = idx % LANES
    acc = jnp.zeros(idx.shape, out_ref.dtype)
    if n_rows <= UNROLL_ROWS:
        t = tbl_ref[...]
        for row in range(n_rows):
            rowv = jnp.broadcast_to(t[row][None, :], idx.shape)
            picked = jnp.take_along_axis(rowv, c, axis=1)
            acc = jnp.where(r == row, picked, acc)
    else:
        def body(row, acc):
            rowv = jnp.broadcast_to(tbl_ref[pl.ds(row, 1), :], idx.shape)
            picked = jnp.take_along_axis(rowv, c, axis=1)
            return jnp.where(r == row, picked, acc)
        acc = jax.lax.fori_loop(0, n_rows, body, acc)
    out_ref[...] = acc


@functools.partial(jax.jit, static_argnames=("n_rows",))
def _pallas_lookup(table2d: jax.Array, idx2d: jax.Array, n_rows: int):
    grid = (idx2d.shape[0] // BLOCK_ROWS,)
    return pl.pallas_call(
        functools.partial(_kernel, n_rows=n_rows),
        out_shape=jax.ShapeDtypeStruct(idx2d.shape, table2d.dtype),
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


def _use_kernel(n_entries: int) -> bool:
    return (jax.default_backend() == "tpu"
            and n_entries <= MAX_ROWS * LANES
            and not os.environ.get("NRC_NO_PALLAS"))


def table_gather(table: jax.Array, idx: jax.Array) -> jax.Array:
    """table: (T,) f32/u32/i32 with T <= 65,536; idx: (...,) int in [0, T).
    Returns table[idx] with the table's dtype.

    Pallas row-sweep on TPU; jnp.take elsewhere.  For f32 tables gradients
    don't flow (use the XLA path for training code that needs a vjp)."""
    if not _use_kernel(table.shape[0]):
        return jnp.take(table, idx, axis=0)

    tdtype = table.dtype
    as_u32 = tdtype in (jnp.uint32, jnp.int32)
    if as_u32:
        table = jax.lax.bitcast_convert_type(
            table.astype(jnp.uint32), jnp.float32)

    n_rows = -(-table.shape[0] // LANES)
    pad_t = n_rows * LANES - table.shape[0]
    t2 = jnp.pad(table, (0, pad_t)).reshape(n_rows, LANES)

    shape = idx.shape
    flat = idx.reshape(-1).astype(jnp.int32)
    n = flat.shape[0]
    block = BLOCK_ROWS * LANES
    pad_n = (-n) % block
    if pad_n:
        flat = jnp.pad(flat, (0, pad_n))
    out = _pallas_lookup(t2, flat.reshape(-1, LANES), n_rows)
    out = out.reshape(-1)[:n].reshape(shape)
    if as_u32:
        out = jax.lax.bitcast_convert_type(out, jnp.uint32).astype(tdtype)
    return out


def pack_bf16_pair(a: jax.Array, b: jax.Array) -> jax.Array:
    """Two f32 arrays -> one u32 array with (bf16(a) << 16) | bf16(b)."""
    ha = jax.lax.bitcast_convert_type(
        a.astype(jnp.bfloat16), jnp.uint16).astype(jnp.uint32)
    hb = jax.lax.bitcast_convert_type(
        b.astype(jnp.bfloat16), jnp.uint16).astype(jnp.uint32)
    return (ha << 16) | hb


def unpack_bf16_pair(w: jax.Array):
    """Inverse of pack_bf16_pair -> (a, b) as float32."""
    a = jax.lax.bitcast_convert_type(
        (w >> 16).astype(jnp.uint16), jnp.bfloat16).astype(jnp.float32)
    b = jax.lax.bitcast_convert_type(
        (w & 0xFFFF).astype(jnp.uint16), jnp.bfloat16).astype(jnp.float32)
    return a, b
