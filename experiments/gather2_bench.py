"""Round-2 gather primitive shootout.

The frame is gather-bound (experiments/profile_stages.py): fine-grid
density lookups and hash-table lookups run through XLA's ~110M elem/s
scalar gather.  This benchmark measures every candidate Pallas primitive
for random lookups into tables of 4k..512k entries so the round-2 kernels
(ops/table_gather.py) are built on measured numbers, not guesses.
"""

import sys
import time
import functools

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def timeit(name, fn, *args, n=5):
    try:
        out = fn(*args)
        jax.block_until_ready(out)
    except Exception as e:
        print(f"{name:<52s} FAILED: {type(e).__name__}: {str(e)[:90]}")
        return None
    # chain iterations via data dependency (axon tunnel acks early)
    @jax.jit
    def run(args):
        def body(tok, _):
            a0 = args[0] + tok if jnp.issubdtype(args[0].dtype, jnp.floating) \
                else args[0]
            out = fn(a0, *args[1:])
            t = jnp.sum(out).astype(jnp.float32) * 0.0
            return t, 0
        tok, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
        return tok
    float(run(args))
    t0 = time.perf_counter()
    float(run(args))
    dt = (time.perf_counter() - t0) / n
    nlk = args[1].size if len(args) > 1 else args[0].size
    print(f"{name:<52s} {dt*1e3:9.2f} ms  ({nlk/dt/1e6:9.1f} M lookups/s)")
    return dt


# --------------------------------------------------------------------------
# 1. row-sweep kernel (macro_gather style) for R rows
# --------------------------------------------------------------------------

def rowsweep_kernel(tbl_ref, idx_ref, out_ref, *, n_rows):
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


def rowsweep(table2d, idx2d, block_rows=256):
    n_rows = table2d.shape[0]
    grid = (idx2d.shape[0] // block_rows,)
    return pl.pallas_call(
        functools.partial(rowsweep_kernel, n_rows=n_rows),
        out_shape=jax.ShapeDtypeStruct(idx2d.shape, jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((n_rows, LANES), lambda g: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, LANES), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_rows, LANES), lambda g: (g, 0),
                               memory_space=pltpu.VMEM),
    )(table2d, idx2d)


# --------------------------------------------------------------------------
# 2. dynamic row-load batch kernel: per lookup, load its (1,128) table row
#    by dynamic sublane index; lane-gather once per 8 lookups
# --------------------------------------------------------------------------

def dynrow_kernel(idx_smem, tbl_ref, lane_ref, out_ref, *, chunk):
    # idx_smem: (chunk,) rows in SMEM; lane_ref: (chunk/8? ...) — we read
    # lanes from VMEM as (chunk//8, 8 -> aligned) ... simpler: lanes as
    # (chunk, 1)? keep lanes in VMEM shaped (chunk//8, 8) is awkward;
    # do groups of 8: build (8,128) tile from 8 dynamic loads
    def body(g, _):
        rows = [idx_smem[g * 8 + k] for k in range(8)]
        tile = jnp.concatenate(
            [tbl_ref[pl.ds(rk, 1), :] for rk in rows], axis=0)  # (8,128)
        lanes = lane_ref[g, :].reshape(8, 1)                    # (8,1)
        picked = jnp.take_along_axis(tile, lanes, axis=1)       # (8,1)
        out_ref[g, :] = picked.reshape(8)
        return 0
    jax.lax.fori_loop(0, chunk // 8, body, 0)


def dynrow(table2d, idx_flat, chunk=2048):
    n = idx_flat.shape[0]
    rows = (idx_flat // LANES).astype(jnp.int32)
    lanes = (idx_flat % LANES).astype(jnp.int32)
    grid = (n // chunk,)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # table stays in HBM/ANY
            pl.BlockSpec((chunk // 8, 8), lambda g, *_: (g, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((chunk // 8, 8), lambda g, *_: (g, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        functools.partial(dynrow_kernel, chunk=chunk),
        out_shape=jax.ShapeDtypeStruct((n // 8, 8), jnp.float32),
        grid_spec=grid_spec,
    )(rows, table2d, lanes.reshape(n // 8, 8))
    return out.reshape(-1)


# variant: table resident in VMEM
def dynrow_vmem(table2d, idx_flat, chunk=2048):
    n = idx_flat.shape[0]
    rows = (idx_flat // LANES).astype(jnp.int32)
    lanes = (idx_flat % LANES).astype(jnp.int32)
    grid = (n // chunk,)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk // 8, 8), lambda g, *_: (g, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((chunk // 8, 8), lambda g, *_: (g, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        functools.partial(dynrow_kernel, chunk=chunk),
        out_shape=jax.ShapeDtypeStruct((n // 8, 8), jnp.float32),
        grid_spec=grid_spec,
    )(rows, table2d, lanes.reshape(n // 8, 8))
    return out.reshape(-1)


# --------------------------------------------------------------------------
# 3. sublane take_along_axis support probe (gather along axis=0)
# --------------------------------------------------------------------------

def sublane_kernel(tbl_ref, idx_ref, out_ref):
    # gather along sublanes: out[i, l] = tbl[idx[i, l], l]
    t = tbl_ref[...]
    idx = idx_ref[...]
    out_ref[...] = jnp.take_along_axis(t, idx, axis=0)


def sublane_gather(table2d, idx2d):
    return pl.pallas_call(
        sublane_kernel,
        out_shape=jax.ShapeDtypeStruct(idx2d.shape, jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(table2d, idx2d)


# --------------------------------------------------------------------------
# 4. full-lane take_along_axis: gather within each row of (N,128) from a
#    broadcasted (N?,T<=128x?) ... lane-gather window probe with big minor
# --------------------------------------------------------------------------

def lanewide_kernel(tbl_ref, idx_ref, out_ref, *, width):
    # out[i, l] = tbl_row[idx[i, l]] where tbl_row is (width,) broadcast;
    # probes whether Mosaic handles take_along_axis with minor dim > 128
    t = jnp.broadcast_to(tbl_ref[...].reshape(1, width),
                         (idx_ref.shape[0], width))
    out_ref[...] = jnp.take_along_axis(t, idx_ref[...], axis=1)


def lanewide(table_row, idx2d):
    width = table_row.shape[-1]
    return pl.pallas_call(
        functools.partial(lanewide_kernel, width=width),
        out_shape=jax.ShapeDtypeStruct(idx2d.shape, jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(table_row, idx2d)


def main():
    print("device:", jax.devices()[0], flush=True)
    rs = np.random.RandomState(0)
    N = 8 * 1024 * 1024

    for t_entries in (4096, 16384, 65536, 262144, 524288, 1671444):
        R = -(-t_entries // LANES)
        print(f"--- table {t_entries} entries ({R} rows) ---", flush=True)
        table = jnp.asarray(rs.rand(R * LANES).astype(np.float32))
        t2 = table.reshape(R, LANES)
        idx = jnp.asarray(
            rs.randint(0, t_entries, N).astype(np.int32))
        timeit("xla take", jax.jit(lambda t, i: jnp.take(t, i)), table, idx)
        if R <= 512:
            timeit(f"rowsweep R={R}", jax.jit(
                functools.partial(rowsweep)), t2, idx.reshape(-1, LANES))
        timeit("dynrow (ANY)", jax.jit(dynrow), t2, idx)
        timeit("dynrow (VMEM)", jax.jit(dynrow_vmem), t2, idx)
        if R <= 1024:
            sidx = jnp.asarray(rs.randint(0, R, (65536, LANES)),
                               jnp.int32)
            timeit(f"sublane TAA R={R} (65k x128)", jax.jit(sublane_gather),
                   t2, sidx)
        if t_entries <= 65536:
            widx = jnp.asarray(rs.randint(0, t_entries, (65536, LANES)),
                               jnp.int32)
            timeit(f"lanewide TAA width={t_entries}", jax.jit(lanewide),
                   table.reshape(1, -1), widx)

    # scatter-add baseline (hash backward)
    print("--- scatter-add (hash backward) ---", flush=True)
    tbl = jnp.zeros(524288, jnp.float32)
    sidx = jnp.asarray(rs.randint(0, 524288, 2 * 1024 * 1024), jnp.int32)
    vals = jnp.asarray(rs.rand(2 * 1024 * 1024).astype(np.float32))
    timeit("xla scatter-add 2M->512k",
           jax.jit(lambda v, i, t: t.at[i].add(v)), vals, sidx, tbl)


if __name__ == "__main__":
    main()
