"""Decompose the fused encode+MLP kernel's time on the real TPU.

Variants (each its own Pallas kernel, chain-timed):
  full          the production kernel (ops/fused_encode_mlp.py)
  no_sweep      corner math + OneBlob + MLP, table gather skipped
  no_mlp        encode only (sweep + corner math + OneBlob), no matmuls
  sweep8        full kernel with the 8-row sublane-select sweep variant
                (loops R/8 sublane tiles; selects sublane by compare
                instead of broadcasting single rows)

Run: python experiments/fused_kernel_decomp.py [N]
"""
import functools
import math
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/experiments")

from nrc_hpm_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()

from infer_decomp import chain_time_all
from nrc_hpm_tpu.config import AppConfig
from nrc_hpm_tpu.models.nrc import encoding as enc
from nrc_hpm_tpu.models.nrc.cache import NeuralRadianceCache
from nrc_hpm_tpu.ops import fused_encode_mlp as fem
from nrc_hpm_tpu.ops.fused_encode_mlp import (BLK_R, OUT_ROWS,
                                              _level_statics,
                                              _transpose_weights)


def variant_kernel(x_ref, tbl_ref, *w_refs_and_out, spec, n_bins, pad_ones,
                   depth, do_sweep=True, do_mlp=True, sweep8=False):
    w_refs = w_refs_and_out[:-1]
    out_ref = w_refs_and_out[-1]
    levels = _level_statics(spec)
    corners = enc._corner_offsets(3)
    primes = (1, 2654435761, 805459861)

    xs = [x_ref[d] for d in range(3)]

    feats = []
    for lev_i, lev in enumerate(levels):
        scale = lev["scale"]
        x0_d, w_d = [], []
        for d in range(3):
            s = xs[d] * scale + 0.5
            f = jnp.floor(s)
            x0_d.append(f.astype(jnp.int32))
            w_d.append(s - f)
        idx_rows, wt_rows = [], []
        for c in range(8):
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
        idx = jnp.concatenate(idx_rows, axis=0)
        wt = jnp.concatenate(wt_rows, axis=0)

        if do_sweep and not sweep8:
            r = idx // 128
            cidx = idx % 128
            acc = jnp.zeros(idx.shape, jnp.float32)

            def body(row, acc, lev_i=lev_i, r=r, cidx=cidx, shape=idx.shape):
                rowv = jnp.broadcast_to(tbl_ref[lev_i, pl.ds(row, 1), :],
                                        shape)
                picked = jnp.take_along_axis(rowv, cidx, axis=1)
                return jnp.where(r == row, picked, acc)

            acc = jax.lax.fori_loop(0, lev["rows"], body, acc)
        elif do_sweep and sweep8:
            # tile8: one dynamic 8-row slice per trip, static row indexing
            # inside — same compare/take count as full, 8x fewer dynamic
            # slices (tests whether dynamic single-row slicing dominates)
            r = idx // 128
            cidx = idx % 128
            acc = jnp.zeros(idx.shape, jnp.float32)
            tiles = -(-lev["rows"] // 8)

            def body8(t, acc, lev_i=lev_i, r=r, cidx=cidx,
                      shape=idx.shape):
                tile = tbl_ref[lev_i, pl.ds(t * 8, 8), :]   # (8, 128)
                for k in range(8):
                    rowv = jnp.broadcast_to(tile[k:k + 1], shape)
                    picked = jnp.take_along_axis(rowv, cidx, axis=1)
                    acc = jnp.where(r == t * 8 + k, picked, acc)
                return acc

            acc = jax.lax.fori_loop(0, tiles, body8, acc)
        else:
            acc = wt  # placeholder feature so downstream shape holds

        w32 = jax.lax.bitcast_convert_type(acc, jnp.uint32)
        f0 = jax.lax.bitcast_convert_type(
            w32 & jnp.uint32(0xFFFF0000), jnp.float32) * wt
        f1 = jax.lax.bitcast_convert_type(w32 << 16, jnp.float32) * wt
        f0 = jnp.sum(f0.reshape(8, BLK_R, 128), axis=0)
        f1 = jnp.sum(f1.reshape(8, BLK_R, 128), axis=0)
        feats.append(f0)
        feats.append(f1)

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
        xd = x_ref[d]
        for bb in range(n_bins):
            z_hi = (float(edges[bb + 1]) - xd) * sigma_inv
            z_lo = (float(edges[bb]) - xd) * sigma_inv
            feats.append(0.5 * (erf_approx(z_hi) - erf_approx(z_lo)))
    for _ in range(pad_ones):
        feats.append(jnp.ones((BLK_R, 128), jnp.float32))

    if do_mlp:
        for s in range(BLK_R):
            h = jnp.concatenate(
                [f[s:s + 1, :] for f in feats], axis=0).astype(jnp.bfloat16)
            h32 = None
            for i, w in enumerate(w_refs):
                h32 = jnp.dot(w[...], h, preferred_element_type=jnp.float32)
                if i + 1 < len(w_refs):
                    h = jnp.maximum(h32, 0.0).astype(jnp.bfloat16)
            out_ref[s] = h32
    else:
        tot = feats[0]
        for f in feats[1:]:
            tot = tot + f
        for s in range(BLK_R):
            out_ref[s] = jnp.broadcast_to(tot[s:s + 1] * 1e-6,
                                          (OUT_ROWS, 128))


@functools.partial(jax.jit, static_argnames=("spec", "n_bins", "pad_ones",
                                             "depth", "do_sweep", "do_mlp",
                                             "sweep8"))
def call_variant(x5t, tables, weights, *, spec, n_bins, pad_ones, depth,
                 do_sweep, do_mlp, sweep8):
    n_blocks = x5t.shape[1]
    kern = functools.partial(variant_kernel, spec=spec, n_bins=n_bins,
                             pad_ones=pad_ones, depth=depth,
                             do_sweep=do_sweep, do_mlp=do_mlp, sweep8=sweep8)
    w_specs = [pl.BlockSpec(w.shape, lambda g, nd=w.ndim: (0,) * nd,
                            memory_space=pltpu.VMEM)
               for w in weights]
    grid = (n_blocks // BLK_R,)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((n_blocks, OUT_ROWS, 128),
                                       jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((5, BLK_R, 128), lambda g: (0, g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(tables.shape, lambda g: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + w_specs,
        out_specs=pl.BlockSpec((BLK_R, OUT_ROWS, 128), lambda g: (g, 0, 0),
                               memory_space=pltpu.VMEM),
    )(x5t, tables, *weights)


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 622592
    cfg = AppConfig.tpu_tuned()
    cache = NeuralRadianceCache(cfg)
    state = cache.init_state(jax.random.PRNGKey(0))
    spec = cache.encoding.grid_spec
    print(f"device={jax.devices()[0]} N={N} levels={spec.n_levels} "
          f"log2={spec.log2_table_size}", flush=True)

    x5 = jax.random.uniform(jax.random.PRNGKey(1), (N, 5))
    packed = cache.encoding.pack_params(state.ema_params["encoding"])
    ptab = packed["hash_table_packed"]
    tables = jax.jit(lambda t: enc._levels_table_u32(t, spec))(ptab)
    mlp_layers = state.ema_params["mlp"]["layers"]
    in_dim = mlp_layers[0].shape[0]
    raw = spec.out_dim + 2 * 4
    pad_ones = in_dim - raw
    weights = tuple(_transpose_weights(mlp_layers, in_dim))

    blk = BLK_R * 128
    pad = (-N) % blk
    if pad:
        x5p = jnp.concatenate([x5, jnp.zeros((pad, 5), x5.dtype)], axis=0)
    else:
        x5p = x5
    m = x5p.shape[0]
    x5t = jnp.asarray(x5p.T.reshape(5, m // 128, 128))

    ref = None
    for name, kw in [
        ("full", dict(do_sweep=True, do_mlp=True, sweep8=False)),
        ("sweep8", dict(do_sweep=True, do_mlp=True, sweep8=True)),
        ("no_sweep", dict(do_sweep=False, do_mlp=True, sweep8=False)),
        ("no_mlp", dict(do_sweep=True, do_mlp=False, sweep8=False)),
    ]:
        fn = lambda x, t, kw=kw: call_variant(
            x, t, weights, spec=spec, n_bins=4, pad_ones=pad_ones,
            depth=len(mlp_layers) - 1, **kw)
        out = jax.block_until_ready(fn(x5t, tables))
        if name == "full":
            ref = out
        if name == "sweep8" and ref is not None:
            err = float(jnp.max(jnp.abs(out - ref)))
            print(f"  sweep8 max|err| vs full: {err:.2e}", flush=True)
        dt = chain_time_all(fn, (x5t, tables), ns=(1, 5))
        print(f"{name:10s} {dt*1e3:8.2f} ms  {N/dt:.3e} samples/s",
              flush=True)


if __name__ == "__main__":
    main()
