"""Round-2 gather experiments, part 3: the same-shape sublane gather.

Mosaic's gather lowering supports take_along_axis(tbl, idx, axis=0) when
idx.shape == tbl.shape (and axis=1 likewise).  With a LANE-REPLICATED table
rep[p, l] = flat[p], the axis-0 form computes out[i, l] = flat[idx[i, l]]
— an arbitrary flat gather served entirely by the vector unit.

Measure rate vs table size R (sublanes).  VMEM cost = R*128*4 bytes.
"""

import functools
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from experiments.timing import chain_timeit

LANES = 128


def _kernel(tbl_ref, idx_ref, out_ref, *, n_rows, blk):
    tbl = tbl_ref[...]
    # process blk sublanes of lookups per table-shaped gather call
    for j in range(blk // n_rows):
        idx = idx_ref[j * n_rows:(j + 1) * n_rows, :]
        out_ref[j * n_rows:(j + 1) * n_rows, :] = \
            jnp.take_along_axis(tbl, idx, axis=0)


def replicated_gather(table2d, idx2d, n_rows, blk):
    return pl.pallas_call(
        functools.partial(_kernel, n_rows=n_rows, blk=blk),
        out_shape=jax.ShapeDtypeStruct(idx2d.shape, table2d.dtype),
        grid=(idx2d.shape[0] // blk,),
        in_specs=[
            pl.BlockSpec((n_rows, LANES), lambda g: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((blk, LANES), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((blk, LANES), lambda g: (g, 0),
                               memory_space=pltpu.VMEM),
    )(table2d, idx2d)


def main():
    print("device:", jax.devices()[0])
    N = 4 * 1024 * 1024
    key = jax.random.PRNGKey(0)

    for R in (8, 32, 128, 512, 2048, 8192):
        T = R * LANES  # virtual flat size; value range for idx is [0, R)
        rep = jnp.broadcast_to(
            jax.random.normal(key, (R, 1), jnp.float32), (R, LANES))
        rep = jnp.asarray(rep)
        idx = jax.random.randint(key, (N,), 0, R, jnp.int32)
        blk = max(R, 512)
        idx2 = idx.reshape(-1, LANES)
        rate = lambda dt: f"{N / dt / 1e6:8.0f} M/s"
        try:
            dt = chain_timeit(f"replicated sublane gather R={R}",
                              lambda i, t: replicated_gather(t, i, R, blk),
                              idx2, rep, n=2)
            print("   ->", rate(dt))
            # correctness
            out = replicated_gather(rep, idx2, R, blk)
            ref = np.asarray(rep)[:, 0][np.asarray(idx2)]
            ok = np.allclose(np.asarray(out), ref)
            print("   correct:", ok)
        except Exception as e:
            print(f"R={R} FAILED: {type(e).__name__}: {str(e)[:160]}")


if __name__ == "__main__":
    main()
