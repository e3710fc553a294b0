"""Fully-fused NRC inference: hash-grid encode -> OneBlob -> MLP in ONE
Pallas kernel — the tcnn fully-fused analog (tiny-cuda-nn serves the whole
encode+network from shared memory; /root/reference/src/NeuralRadianceCache.cu
:30-40,134-145 configures and invokes it).

Why fused (measured on TPU v5e, experiments/infer_decomp.py @ 622k samples):
the split pipeline spent ~47 ms in the XLA corner-index stage (materializing
(128, N) index/weight temporaries through HBM between unfused kernels) plus
~70 ms in the rowsweep gather kernel (whose index blocks round-trip HBM).
In-kernel the corner math runs on VMEM-resident (rows, 128) tiles fused with
the sweep, and nothing but x5 and the output touches HBM.

Primitive choice (experiments/lane_gather_bench.py): per-row sweep
(broadcast row + lane take_along_axis + select) reaches 1.16 G lookups/s at
R=128; a one-hot MXU row-gather is SLOWER (0.71 G/s, VMEM-bandwidth bound on
the (M, 128) row products); the lane gather itself is ~free.  So the kernel
sweeps each level's (R_l, 128) table with STATIC per-level trip counts.

Layout: the sample block is a (BLK_R, 128) tile grid (BLK = BLK_R * 128
samples per program).  All arithmetic stays in tile land; the MLP runs
TRANSPOSED (W^T @ h) per sub-row so no in-kernel transposes exist.  x5
arrives as (5, N/128, 128); the output leaves as (N/128, 8, 128) and is
re-laid to (N, 3) by XLA (~20 MB, sub-ms).

Exactness: bit-comparable to the split path (hash_grid_encode_packed +
one_blob_encode + fused_mlp_infer) up to corner-summation order — the same
bf16-packed table words are gathered and the same bf16 MXU matmuls run in
the same layer order; tests assert allclose at 2e-3 absolute (bf16 scale).
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.nrc.encoding import HashGridSpec, _corner_offsets
from .loops import unrolled_fori

BLK_R = 32         # sample-block rows; BLK = BLK_R * 128 samples.  Swept on
                   # TPU v5e (experiments/kernel_tune.py): 8 -> 11.9M, 16 ->
                   # 13.0M, 32 -> 13.9M samples/s at the bench workload.
OUT_ROWS = 8       # output channels padded to one sublane tile


def _level_statics(spec: HashGridSpec):
    """Per-level static constants baked into the kernel."""
    levels = []
    for lev in range(spec.n_levels):
        levels.append(dict(
            scale=float(spec.level_scale(lev)),
            res=int(spec.level_resolution(lev)),
            dense=bool(spec.level_is_dense(lev)),
            params=int(spec.level_params(lev)),
            rows=-(-spec.level_params(lev) // 128),
        ))
    return levels


def _kernel(x_ref, tbl_ref, *w_refs_and_out, spec: HashGridSpec,
            n_bins: int, pad_ones: int, depth: int, blk_r: int = BLK_R):
    w_refs = w_refs_and_out[:-1]
    out_ref = w_refs_and_out[-1]
    levels = _level_statics(spec)
    corners = _corner_offsets(3)                      # np (8, 3)
    primes = (1, 2654435761, 805459861)

    xs = [x_ref[d] for d in range(3)]                 # (BLK_R, 128) each

    feats = []                                        # list of (BLK_R, 128)
    for lev_i, lev in enumerate(levels):
        scale = lev["scale"]
        # per-dim lattice coords for this level
        x0_d, w_d = [], []
        for d in range(3):
            s = xs[d] * scale + 0.5
            f = jnp.floor(s)
            x0_d.append(f.astype(jnp.int32))
            w_d.append(s - f)
        # corner lookups in (8*BLK_R, 128) layout: corner-major rows
        idx_rows, wt_rows = [], []
        for c in range(8):
            # density is static per level: build only the index form that
            # level uses (the dense stride overflows int32 on fine levels)
            lin = None
            hsh = None
            wt = None
            stride = 1
            for d in range(3):
                cd = x0_d[d] + int(corners[c, d])
                wc = w_d[d] if corners[c, d] else 1.0 - w_d[d]
                wt = wc if wt is None else wt * wc
                if lev["dense"]:
                    cc = jnp.clip(cd, 0, lev["res"] - 1)
                    lin = cc * stride if lin is None else lin + cc * stride
                    stride *= lev["res"]
                else:
                    h = cd.astype(jnp.uint32) * jnp.uint32(primes[d % 3])
                    hsh = h if d == 0 else hsh ^ h
            if lev["dense"]:
                idx = lin
            else:
                idx = (hsh % jnp.uint32(lev["params"])).astype(jnp.int32)
            idx_rows.append(idx)
            wt_rows.append(wt)
        idx = jnp.concatenate(idx_rows, axis=0)       # (8*BLK_R, 128)
        wt = jnp.concatenate(wt_rows, axis=0)
        r = idx // 128
        cidx = idx % 128

        # rowsweep against this level's VMEM-resident table, in 8-row
        # tiles: ONE dynamic slice per trip with static row indexing
        # inside — dynamic single-row slicing dominated the old sweep
        # (experiments/fused_kernel_decomp.py: 68.8 -> 47.7 ms for the
        # whole kernel, bitwise-identical output).  _levels_table_u32
        # pads every level to a multiple of 8 rows.
        acc = jnp.zeros(idx.shape, jnp.float32)
        tiles = -(-lev["rows"] // 8)

        def body8(t, acc, lev_i=lev_i, r=r, cidx=cidx, shape=idx.shape):
            tile = tbl_ref[lev_i, pl.ds(t * 8, 8), :]      # (8, 128)
            for k in range(8):
                rowv = jnp.broadcast_to(tile[k:k + 1], shape)
                picked = jnp.take_along_axis(rowv, cidx, axis=1)
                acc = jnp.where(r == t * 8 + k, picked, acc)
            return acc

        acc = jax.lax.fori_loop(0, tiles, body8, acc)

        # unpack the bf16-packed pair and pool the 8 corners
        w32 = jax.lax.bitcast_convert_type(acc, jnp.uint32)
        f0 = jax.lax.bitcast_convert_type(
            w32 & jnp.uint32(0xFFFF0000), jnp.float32) * wt
        f1 = jax.lax.bitcast_convert_type(w32 << 16, jnp.float32) * wt
        f0 = jnp.sum(f0.reshape(8, blk_r, 128), axis=0)   # (blk_r, 128)
        f1 = jnp.sum(f1.reshape(8, blk_r, 128), axis=0)
        feats.append(f0)
        feats.append(f1)

    # -- OneBlob direction encoding (theta, phi rows of x) ----------------
    # Mosaic has no erf lowering; Abramowitz-Stegun 7.1.26 (|err| <=
    # 1.5e-7, ~30x below the bf16 rounding the MLP applies anyway)
    def erf_approx(x):
        s = jnp.sign(x)
        ax = jnp.abs(x)
        t = 1.0 / (1.0 + 0.3275911 * ax)
        poly = t * (0.254829592 + t * (-0.284496736 + t * (
            1.421413741 + t * (-1.453152027 + t * 1.061405429))))
        return s * (1.0 - poly * jnp.exp(-ax * ax))

    sigma_inv = n_bins / math.sqrt(2.0)
    edges = np.linspace(0.0, 1.0, n_bins + 1)
    for d in (3, 4):
        xd = x_ref[d]                                 # (BLK_R, 128)
        for b in range(n_bins):
            z_hi = (float(edges[b + 1]) - xd) * sigma_inv
            z_lo = (float(edges[b]) - xd) * sigma_inv
            feats.append(0.5 * (erf_approx(z_hi) - erf_approx(z_lo)))
    for _ in range(pad_ones):
        feats.append(jnp.ones((blk_r, 128), jnp.float32))

    # -- transposed MLP, ONE wide matmul chain per block -------------------
    # A per-sub-row loop issues depth*BLK_R tiny (width, in)@(in, 128)
    # matmuls whose MXU pipe-fill latency dominates the kernel; batching
    # the whole block to (in_dim, BLK_R*128) runs the same FLOPs in depth
    # full-width matmuls.
    h = jnp.stack(feats, axis=0).reshape(
        len(feats), blk_r * 128).astype(jnp.bfloat16)
    h32 = None
    for i, w in enumerate(w_refs):
        h32 = jnp.dot(w[...], h, preferred_element_type=jnp.float32)
        if i + 1 < len(w_refs):
            h = jnp.maximum(h32, 0.0).astype(jnp.bfloat16)
    out_ref[...] = h32.reshape(OUT_ROWS, blk_r, 128)


def _transpose_weights(layers, in_dim: int):
    """f32 layer list -> transposed bf16 list: W0T (width, in_dim),
    WiT (width, width), WoutT (OUT_ROWS, width)."""
    out = []
    for i, w in enumerate(layers):
        wt = w.astype(jnp.bfloat16).T
        if i == len(layers) - 1:
            wt = jnp.pad(wt, ((0, OUT_ROWS - wt.shape[0]), (0, 0)))
        out.append(wt)
    return out


def use_fused_encode(spec, enc_cfg, n: int) -> bool:
    """Kernel applicability: default composite encoding (hash pos + OneBlob
    dir, 2 features/level) with rowsweep-sized tables, on TPU."""
    return (jax.default_backend() == "tpu"
            and spec is not None
            and spec.n_dims == 3 and spec.n_features == 2
            and enc_cfg.dir_id == 0
            and max(spec.level_params(lv)
                    for lv in range(spec.n_levels)) <= (1 << 16)
            and n >= BLK_R * 128
            and not os.environ.get("NRC_NO_PALLAS"))


@functools.partial(jax.jit, static_argnames=("spec", "n_bins", "pad_ones",
                                             "depth", "blk_r", "interpret"))
def _call(x5t, tables, weights, *, spec, n_bins, pad_ones, depth,
          blk_r=BLK_R, interpret=False):
    n_blocks = x5t.shape[1]
    kern = functools.partial(_kernel, spec=spec, n_bins=n_bins,
                             pad_ones=pad_ones, depth=depth, blk_r=blk_r)
    w_specs = [pl.BlockSpec(w.shape, lambda g, nd=w.ndim: (0,) * nd,
                            memory_space=pltpu.VMEM)
               for w in weights]
    grid = (n_blocks // blk_r,)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((OUT_ROWS, n_blocks, 128),
                                       jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((5, blk_r, 128), lambda g: (0, g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(tables.shape, lambda g: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + w_specs,
        out_specs=pl.BlockSpec((OUT_ROWS, blk_r, 128), lambda g: (0, g, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x5t, tables, *weights)


def fused_encode_mlp_infer(packed_table: jax.Array, mlp_layers,
                           x5: jax.Array, spec: HashGridSpec,
                           n_bins: int = 4, out_dim: int = 3,
                           blk_r: int | None = None,
                           interpret: bool = False) -> jax.Array:
    """x5 (N, 5) raw NRC inputs -> (N, out_dim) cache prediction, one fused
    kernel.  ``packed_table`` is pack_table_bf16's (P,) uint32 word table;
    ``mlp_layers`` the f32 weight list (first layer in_dim must equal the
    composite encoding's padded out_dim)."""
    from ..models.nrc.encoding import _levels_table_u32

    if blk_r is None:
        blk_r = int(os.environ.get("NRC_FUSED_BLK_R", BLK_R))
    n = x5.shape[0]
    blk = blk_r * 128
    pad = (-n) % blk
    if pad:
        x5 = jnp.concatenate([x5, jnp.zeros((pad, 5), x5.dtype)], axis=0)
    m = x5.shape[0]
    x5t = x5.T.reshape(5, m // 128, 128)
    tables = _levels_table_u32(packed_table, spec)
    in_dim = mlp_layers[0].shape[0]
    raw = spec.out_dim + 2 * n_bins
    pad_ones = in_dim - raw
    assert pad_ones >= 0, (in_dim, raw)
    weights = _transpose_weights(mlp_layers, in_dim)
    out = _call(x5t, tables, tuple(weights), spec=spec, n_bins=n_bins,
                pad_ones=pad_ones, depth=len(mlp_layers) - 1,
                blk_r=blk_r, interpret=interpret)
    out = jnp.moveaxis(out, 0, 2).reshape(m, OUT_ROWS)[:n, :out_dim]
    return out
