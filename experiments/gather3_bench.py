"""Round-2 gather experiments: what is the fastest random-gather primitive
Pallas/Mosaic offers on this TPU?

Candidates, all gathering N random lookups from a T-entry f32 table:
  A. XLA jnp.take                      (baseline ~126M/s from round 1)
  B. rowsweep table_gather             (round 1 kernel, ~860M/s small R)
  C. in-Pallas jnp.take from VMEM ref  (does Mosaic have a fast path?)
  D. one-hot MXU matmul gather         (cost = T MACs / lookup)
  E. in-Pallas take_along_axis row gather after one-hot row select
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

from experiments.timing import chain_timeit

LANES = 128


# --- C: in-Pallas flat take ------------------------------------------------
def _take_kernel(tbl_ref, idx_ref, out_ref):
    tbl = tbl_ref[...]
    idx = idx_ref[...]
    out_ref[...] = jnp.take(tbl.reshape(-1), idx, axis=0)


def pallas_take(table2d, idx2d):
    return pl.pallas_call(
        _take_kernel,
        out_shape=jax.ShapeDtypeStruct(idx2d.shape, table2d.dtype),
        grid=(idx2d.shape[0] // 512,),
        in_specs=[
            pl.BlockSpec((table2d.shape[0], LANES), lambda g: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((512, LANES), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((512, LANES), lambda g: (g, 0),
                               memory_space=pltpu.VMEM),
    )(table2d, idx2d)


# --- D: one-hot MXU gather ---------------------------------------------------
def _onehot_kernel(tbl_ref, idx_ref, out_ref, *, n_rows):
    idx = idx_ref[...]                      # (BLK, 128) int32
    r = (idx // LANES).astype(jnp.int32)
    c = idx % LANES
    blk = idx.shape[0]
    # one-hot over rows: (BLK*128, n_rows) is too big; instead process
    # row-major: build one-hot (BLK, 128, ?) no — reshape lookups to rows
    # of 128: each lookup row builds (128, n_rows) one-hot? Simpler:
    # flatten to (BLK*128 // 128, 128) blocks... we do: one-hot as
    # (BLK*128, n_rows) bf16 via iota compare in chunks of 8 sublanes.
    flat_r = r.reshape(-1, LANES)           # (BLK, 128)
    # build one-hot (BLK*128, n_rows): too big for VMEM at BLK=512, R=512
    # (512*128*512*2B = 64MB). Instead: for each 128-lookup row chunk:
    # not feasible as single matmul; use (BLK, 128) @ ... -> loop.
    # Simplest shape: treat lookups as M = BLK*128 rows in chunks of 256.
    M = blk * LANES
    CH = 1024
    tbl = tbl_ref[...].astype(jnp.bfloat16)  # (n_rows, 128)
    rf = r.reshape(M)
    cf = c.reshape(M)
    out = jnp.zeros((M,), jnp.float32)

    def body(i, out):
        rs = jax.lax.dynamic_slice(rf, (i * CH,), (CH,))
        cs = jax.lax.dynamic_slice(cf, (i * CH,), (CH,))
        iot = jax.lax.broadcasted_iota(jnp.int32, (CH, n_rows), 1)
        oh = (iot == rs[:, None]).astype(jnp.bfloat16)
        rows = jnp.dot(oh, tbl, preferred_element_type=jnp.float32)
        picked = jnp.take_along_axis(rows, cs[:, None], axis=1)[:, 0]
        return jax.lax.dynamic_update_slice(out, picked, (i * CH,))

    out = jax.lax.fori_loop(0, M // CH, body, out)
    out_ref[...] = out.reshape(blk, LANES)


def onehot_gather(table2d, idx2d, n_rows):
    return pl.pallas_call(
        functools.partial(_onehot_kernel, n_rows=n_rows),
        out_shape=jax.ShapeDtypeStruct(idx2d.shape, jnp.float32),
        grid=(idx2d.shape[0] // 512,),
        in_specs=[
            pl.BlockSpec((table2d.shape[0], LANES), lambda g: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((512, LANES), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((512, LANES), lambda g: (g, 0),
                               memory_space=pltpu.VMEM),
    )(table2d, idx2d)


def main():
    print("device:", jax.devices()[0])
    N = 4 * 1024 * 1024
    key = jax.random.PRNGKey(0)

    for T in (4096, 16384, 65536, 524288, 1 << 21):
        n_rows = T // LANES
        tbl = jax.random.normal(key, (T,), jnp.float32)
        tbl_bf = tbl.astype(jnp.bfloat16).astype(jnp.float32)
        t2 = tbl_bf.reshape(n_rows, LANES)
        idx = jax.random.randint(key, (N,), 0, T, jnp.int32)
        idx2 = idx.reshape(-1, LANES)
        rate = lambda dt: f"{N / dt / 1e6:8.0f} M/s"

        dt = chain_timeit(f"A xla take        T={T}",
                          lambda i, t: jnp.take(t, i, axis=0), idx, tbl, n=2)
        print("   ->", rate(dt))
        from nrc_hpm_tpu.ops.table_gather import _pallas_lookup
        if n_rows <= 512:
            dt = chain_timeit(f"B rowsweep        T={T}",
                              lambda i, t: _pallas_lookup(t, i, n_rows),
                              idx2, t2, n=2)
            print("   ->", rate(dt))
        try:
            dt = chain_timeit(f"C pallas take     T={T}",
                              lambda i, t: pallas_take(t, i), idx2, t2, n=2)
            print("   ->", rate(dt))
        except Exception as e:
            print(f"C pallas take     T={T} FAILED: {type(e).__name__}: "
                  f"{str(e)[:200]}")
        if n_rows <= 1024:
            try:
                dt = chain_timeit(f"D onehot mxu      T={T}",
                                  lambda i, t: onehot_gather(t, i, n_rows),
                                  idx2, t2, n=2)
                print("   ->", rate(dt))
            except Exception as e:
                print(f"D onehot mxu      T={T} FAILED: {type(e).__name__}: "
                      f"{str(e)[:200]}")


if __name__ == "__main__":
    main()
