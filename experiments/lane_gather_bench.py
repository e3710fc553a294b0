"""Micro-bench of in-kernel table-gather primitives on the TPU.

Question: what is the fastest way to serve idx -> table[idx] for a
VMEM-resident (R, 128) table at ~80M lookups/call?

  a) rowsweep: fori over R rows, compare+select        (current encoding)
  b) rowsweep2: sweep with take_along_axis per row     (current kernel)
  c) onehot-MXU: onehot(row) @ table -> picked row, then lane-reduce
  d) lane take_along_axis on a (M, 128) block          (lane-gather cost)

Run on the real TPU: PYTHONPATH=... python experiments/lane_gather_bench.py
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from infer_decomp import chain_time_all  # noqa: E402

M_BLK = 256          # lookup rows per program (x128 lanes)
R = 128              # table rows (2^14 entries / 128)


def _sweep_kernel(tbl_ref, idx_ref, out_ref):
    idx = idx_ref[...]
    r = idx // 128
    c = idx % 128
    acc = jnp.zeros(idx.shape, jnp.float32)

    def body(row, acc):
        rowv = jnp.broadcast_to(tbl_ref[pl.ds(row, 1), :], idx.shape)
        picked = jnp.take_along_axis(rowv, c, axis=1)
        return jnp.where(r == row, picked, acc)

    out_ref[...] = jax.lax.fori_loop(0, R, body, acc)


def _onehot_kernel(tbl_ref, idx_ref, out_ref):
    idx = idx_ref[...]                      # (MB, 128) entries
    mb = idx.shape[0]
    r = idx // 128
    c = idx % 128
    iota_r = jax.lax.broadcasted_iota(jnp.int32, (mb, 128, R), 2)
    oh = (r[..., None] == iota_r).astype(jnp.bfloat16)      # (MB, 128, R)
    rows = jnp.dot(oh.reshape(mb * 128, R),
                   tbl_ref[...].astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32)      # (MB*128, 128)
    rows3 = rows.reshape(mb, 128, 128)
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (mb, 128, 128), 2)
    out_ref[...] = jnp.sum(
        jnp.where(iota_c == c[..., None], rows3, 0.0), axis=2)


def _lanegather_kernel(tbl_ref, idx_ref, out_ref):
    # cost of the pure lane gather: pretend every lookup hits row 0
    idx = idx_ref[...]
    c = idx % 128
    rowv = jnp.broadcast_to(tbl_ref[pl.ds(0, 1), :], idx.shape)
    out_ref[...] = jnp.take_along_axis(rowv, c, axis=1)


def run(name, kernel, tbl, idx, m_blk=M_BLK):
    n_m = idx.shape[0]
    f = jax.jit(lambda t, i: pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(idx.shape, jnp.float32),
        grid=(n_m // m_blk,),
        in_specs=[
            pl.BlockSpec((R, 128), lambda g: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m_blk, 128), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m_blk, 128), lambda g: (g, 0),
                               memory_space=pltpu.VMEM),
    )(t, i))
    try:
        dt = chain_time_all(f, (tbl, idx), ns=(1, 5))
    except Exception as e:
        print(f"{name:14s} FAILED: {str(e)[:160]}", flush=True)
        return
    lookups = idx.size
    print(f"{name:14s} {dt*1e3:8.2f} ms  {lookups/dt/1e9:7.2f} G lookups/s",
          flush=True)


def main():
    n_lookups = 1 << 23  # 8.4M lookups (~1/10 of the frame's 80M)
    m = n_lookups // 128
    key = jax.random.PRNGKey(0)
    tbl = jax.random.uniform(key, (R, 128), jnp.float32)
    idx = jax.random.randint(jax.random.PRNGKey(1), (m, 128), 0, R * 128,
                             dtype=jnp.int32)
    print(f"device={jax.devices()[0]} lookups={n_lookups}", flush=True)
    run("sweep", _sweep_kernel, tbl, idx)
    run("onehot-mxu", _onehot_kernel, tbl, idx, m_blk=32)
    run("onehot-mxu64", _onehot_kernel, tbl, idx, m_blk=64)
    run("lane-gather", _lanegather_kernel, tbl, idx)


if __name__ == "__main__":
    main()
