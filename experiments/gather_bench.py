"""Micro-benchmark of density-lookup formulations on TPU.

The volume grid is small (126x86x154 ~ 1.7M voxels) but the renderer needs
~100M+ random lookups per frame. XLA's HBM gather runs ~0.1 elem/cycle;
this experiment hunts for a faster primitive (dtype variants, 2D layouts,
Pallas kernel with the table resident in VMEM).
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timeit(name, fn, *args, n=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    size = out.size if hasattr(out, "size") else np.prod(out.shape)
    print(f"{name:<44s} {dt*1e3:9.2f} ms  ({size/dt/1e6:8.1f} M elem/s)")
    return out


def main():
    print("device:", jax.devices()[0])
    X, Y, Z = 126, 86, 154
    T = X * Y * Z
    N = 64 * 1024 * 1024  # lookups per call

    rs = np.random.RandomState(0)
    table_f32 = jnp.asarray(rs.rand(T).astype(np.float32))
    table_u8 = jnp.asarray((rs.rand(T) * 255).astype(np.uint8))
    table_i32 = table_u8.astype(jnp.int32)
    idx = jnp.asarray(rs.randint(0, T, N).astype(np.int32))
    idx_sorted = jnp.sort(idx)

    timeit("take f32 table", jax.jit(lambda t, i: jnp.take(t, i)), table_f32, idx)
    timeit("take u8 table", jax.jit(lambda t, i: jnp.take(t, i)), table_u8, idx)
    timeit("take i32 table", jax.jit(lambda t, i: jnp.take(t, i)), table_i32, idx)
    timeit("take f32 sorted idx", jax.jit(lambda t, i: jnp.take(t, i)),
           table_f32, idx_sorted)

    # 2D shaped index/table
    idx2d = idx.reshape(-1, 128)
    timeit("take f32, idx (M,128)", jax.jit(lambda t, i: jnp.take(t, i)),
           table_f32, idx2d)

    # Pallas: table resident in VMEM, per-block gather
    TBL_PAD = ((T + 127) // 128) * 128
    table_pad = jnp.zeros(TBL_PAD, jnp.float32).at[:T].set(table_f32)
    table_2d = table_pad.reshape(-1, 128)  # (rows, 128)

    BLK = 8 * 1024

    def gather_kernel(tbl_ref, idx_ref, out_ref):
        ids = idx_ref[...]
        out_ref[...] = jnp.take(tbl_ref[...].reshape(-1), ids.reshape(-1)
                                ).reshape(ids.shape)

    @jax.jit
    def pallas_gather(tbl2d, i):
        i2 = i.reshape(-1, BLK)
        grid = (i2.shape[0],)
        return pl.pallas_call(
            gather_kernel,
            out_shape=jax.ShapeDtypeStruct(i2.shape, jnp.float32),
            grid=grid,
            in_specs=[
                pl.BlockSpec(tbl2d.shape, lambda g: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, BLK), lambda g: (g, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, BLK), lambda g: (g, 0),
                                   memory_space=pltpu.VMEM),
        )(tbl2d, i2).reshape(-1)

    try:
        out = timeit("pallas VMEM gather", pallas_gather, table_2d, idx)
        ref = jnp.take(table_pad, idx)
        print("   pallas correct:", bool(jnp.allclose(out, ref)))
    except Exception as e:
        print("pallas VMEM gather failed:", str(e)[:500])

    # Pallas: dynamic_gather via take_along_axis within rows of 128 lanes?
    def gather_kernel2(tbl_ref, row_ref, col_ref, out_ref):
        rows = row_ref[...]
        cols = col_ref[...]
        vals = tbl_ref[rows.reshape(-1)]      # (BLK, 128) row gather
        picked = jnp.take_along_axis(vals, cols.reshape(-1, 1), axis=1)
        out_ref[...] = picked.reshape(rows.shape)

    @jax.jit
    def pallas_gather2(tbl2d, i):
        rows = (i // 128).reshape(-1, BLK)
        cols = (i % 128).reshape(-1, BLK)
        grid = (rows.shape[0],)
        return pl.pallas_call(
            gather_kernel2,
            out_shape=jax.ShapeDtypeStruct(rows.shape, jnp.float32),
            grid=grid,
            in_specs=[
                pl.BlockSpec(tbl2d.shape, lambda g: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, BLK), lambda g: (g, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, BLK), lambda g: (g, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, BLK), lambda g: (g, 0),
                                   memory_space=pltpu.VMEM),
        )(tbl2d, rows, cols).reshape(-1)

    try:
        out = timeit("pallas row-gather + take_along", pallas_gather2,
                     table_2d, idx)
        ref = jnp.take(table_pad, idx)
        print("   pallas2 correct:", bool(jnp.allclose(out, ref)))
    except Exception as e:
        print("pallas2 failed:", str(e)[:500])


if __name__ == "__main__":
    main()
