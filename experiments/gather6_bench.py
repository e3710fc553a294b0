"""Round-4 gather experiments: LARGE-table in-kernel gather strategies.

The fine density grid (1.7M voxels) is the one table the rowsweep cannot
serve (O(N*R) at R~13k rows) and XLA's scalar gather path caps at ~115M
lookups/s — the tracking loops burn ~50-100M fine lookups per 1080p frame
on it.  Candidates measured here, all on a VMEM-resident (R, 128) table:

  A. xla_take          jnp.take baseline (the current path)
  B. kernel_take       jnp.take(flat, idx) INSIDE a Pallas kernel (does
                       Mosaic lower an arbitrary in-VMEM gather at all?)
  C. two_stage         per 128-lookup block: row fetch via
                       take_along_axis(tbl, bcast_row_idx, axis=0) (the
                       sublane gather) then lane pick via axis=1
                       take_along_axis.  Serves 1 lookup per output lane
                       column but 128 rows per gather op.
  D. two_stage_u32     same on the 4-voxel-packed u32 table (1/4 rows,
                       byte extract after the pick)

Run on the real TPU: python experiments/gather6_bench.py
"""
import functools
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
N = 1 << 22          # lookups per call (~4.2M, a frame-segment's worth)
TBL = 13282 * LANES  # fine-grid scale (1.7M entries)


def timeit(name, fn, *args, n=8):
    try:
        f = jax.jit(fn)
        out = f(*args)
        jax.block_until_ready(out)
        float(jnp.asarray(jax.tree.leaves(out)[0]).ravel()[0])
    except Exception as e:
        print(f"{name:16s} FAILED: {str(e)[:200]}", flush=True)
        return None
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    float(jnp.asarray(jax.tree.leaves(out)[0]).ravel()[0])
    dt = (time.perf_counter() - t0) / n
    print(f"{name:16s} {dt*1e3:9.2f} ms  {N/dt/1e6:9.1f} M lookups/s",
          flush=True)
    return dt


# --- B: plain take inside a kernel -----------------------------------------

def _kernel_take(tbl_ref, idx_ref, out_ref):
    flat = tbl_ref[...].reshape(-1)
    out_ref[...] = jnp.take(flat, idx_ref[...], axis=0)


def kernel_take(tbl2d, idx2d):
    blk = 512
    return pl.pallas_call(
        _kernel_take,
        out_shape=jax.ShapeDtypeStruct(idx2d.shape, tbl2d.dtype),
        grid=(idx2d.shape[0] // blk,),
        in_specs=[
            pl.BlockSpec((tbl2d.shape[0], LANES), lambda g: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((blk, LANES), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((blk, LANES), lambda g: (g, 0),
                               memory_space=pltpu.VMEM),
    )(tbl2d, idx2d)


# --- C: two-stage sublane-row gather + lane pick ---------------------------
# Each (BLK, 128) index block is processed column-of-lookups-at-a-time:
# lookup k lives at sublane k; its row index is broadcast across lanes so
# take_along_axis(tbl, rows, axis=0) fetches full row r_k into sublane k,
# then an axis=1 take_along_axis picks lane c_k.  BLK lookups per pair of
# gathers of shape (BLK, 128).

def _kernel_two_stage(tbl_ref, idx_ref, out_ref, *, blk):
    idx = idx_ref[...]
    r = idx // LANES
    c = idx % LANES
    tbl = tbl_ref[...]
    # serve each lane column j separately: lookups (0..blk-1, j)
    acc = jnp.zeros((blk, LANES), idx.dtype)
    for j in range(LANES):
        rj = jax.lax.broadcast_in_dim(r[:, j], (blk, LANES), (0,))
        rows = jnp.take_along_axis(tbl, rj, axis=0)        # (blk, 128)
        cj = jax.lax.broadcast_in_dim(c[:, j], (blk, LANES), (0,))
        picked = jnp.take_along_axis(rows, cj, axis=1)     # (blk, 128)
        acc = acc.at[:, j].set(picked[:, 0])
    out_ref[...] = acc


def two_stage(tbl2d, idx2d, blk=256):
    return pl.pallas_call(
        functools.partial(_kernel_two_stage, blk=blk),
        out_shape=jax.ShapeDtypeStruct(idx2d.shape, idx2d.dtype),
        grid=(idx2d.shape[0] // blk,),
        in_specs=[
            pl.BlockSpec((tbl2d.shape[0], LANES), lambda g: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((blk, LANES), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((blk, LANES), lambda g: (g, 0),
                               memory_space=pltpu.VMEM),
    )(tbl2d, idx2d)


# --- C2: row gather only (rate ceiling of the sublane gather) --------------

def _kernel_rowgather(tbl_ref, idx_ref, out_ref):
    idx = idx_ref[...]
    r = idx % (TBL // LANES)
    out_ref[...] = jnp.take_along_axis(tbl_ref[...], r, axis=0)


def rowgather(tbl2d, idx2d):
    blk = 256
    return pl.pallas_call(
        _kernel_rowgather,
        out_shape=jax.ShapeDtypeStruct(idx2d.shape, jnp.int32),
        grid=(idx2d.shape[0] // blk,),
        in_specs=[
            pl.BlockSpec((tbl2d.shape[0], LANES), lambda g: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((blk, LANES), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((blk, LANES), lambda g: (g, 0),
                               memory_space=pltpu.VMEM),
    )(tbl2d, idx2d)


def main():
    key = jax.random.PRNGKey(0)
    tbl = jax.random.normal(key, (TBL,), jnp.float32)
    tbl2d = tbl.reshape(-1, LANES)
    tbl2d_i = jnp.arange(TBL, dtype=jnp.int32).reshape(-1, LANES)
    idx = jax.random.randint(jax.random.PRNGKey(1), (N,), 0, TBL,
                             dtype=jnp.int32)
    idx2d = idx.reshape(-1, LANES)

    timeit("xla_take", lambda t, i: jnp.take(t, i, axis=0), tbl, idx)
    timeit("kernel_take", kernel_take, tbl2d, idx2d)
    timeit("rowgather_i32", rowgather, tbl2d_i, idx2d)
    timeit("two_stage", two_stage, tbl2d_i, idx2d)

    # correctness spot check for two_stage if it ran
    try:
        out = jax.jit(two_stage)(tbl2d_i, idx2d[:256 * 4])
        ref = idx2d[:256 * 4]
        ok = bool(jnp.all(out == ref))
        print(f"two_stage correct: {ok}")
    except Exception as e:
        print(f"two_stage check failed: {str(e)[:120]}")


if __name__ == "__main__":
    main()
