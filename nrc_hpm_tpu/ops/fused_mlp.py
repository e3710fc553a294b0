"""Pallas TPU kernel: fused inference for the NRC MLP.

The tcnn equivalent is the fully-fused MLP of tiny-cuda-nn
(/root/reference/src/NeuralRadianceCache.cu:30-36 configures it: 64 wide,
ReLU, no output activation, no biases).  XLA already runs each matmul on
the MXU; what the fusion buys is keeping the (N, 64) activations in VMEM
across all ``depth + 1`` layers instead of round-tripping ~2 GB of
intermediates through HBM at 1080p sample counts.

The kernel processes BLK samples per grid step with every weight matrix
VMEM-resident (64x64 bf16 = 8 KB each), computing

    h_0 = relu(x W_0), h_i = relu(h_{i-1} W_i), out = h_D W_out

with bf16 MXU matmuls and f32 accumulation — bit-comparable to
models/nrc/mlp.mlp_apply (same dtypes, same order), which remains the
training path and the oracle this kernel is tested against.

Weights are pre-padded so every matmul is lane-aligned: the input layer to
(in_pad, W), the output layer to (W, 128) with zero columns beyond 3.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLK = 512
OUT_LANES = 128


def _kernel(x_ref, *refs):
    w_refs = refs[:-1]
    out_ref = refs[-1]
    h = x_ref[...].astype(jnp.bfloat16)
    h32 = None
    for i, w in enumerate(w_refs):
        h32 = jnp.dot(h, w[...], preferred_element_type=jnp.float32)
        if i + 1 < len(w_refs):
            h = jnp.maximum(h32, 0.0).astype(jnp.bfloat16)
    out_ref[...] = h32


def pad_weights(layers):
    """f32 layer list -> bf16 padded list for the kernel: input dim padded
    up to a multiple of 8 lanes is unnecessary (matmul K dim is free), but
    the OUTPUT layer is padded to OUT_LANES columns."""
    padded = []
    for i, w in enumerate(layers):
        wb = w.astype(jnp.bfloat16)
        if i == len(layers) - 1:
            wb = jnp.pad(wb, ((0, 0), (0, OUT_LANES - wb.shape[1])))
        padded.append(wb)
    return padded


def use_fused(depth: int, width: int) -> bool:
    return (jax.default_backend() == "tpu" and width <= 256
            and not os.environ.get("NRC_NO_PALLAS"))


@jax.jit
def _call(x, padded_weights):
    n = x.shape[0]
    in_dim = x.shape[1]
    grid = (n // BLK,)
    w_specs = [pl.BlockSpec(w.shape, lambda g: (0, 0),
                            memory_space=pltpu.VMEM)
               for w in padded_weights]
    return pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((n, OUT_LANES), jnp.float32),
        grid=grid,
        in_specs=[pl.BlockSpec((BLK, in_dim), lambda g: (g, 0),
                               memory_space=pltpu.VMEM)] + w_specs,
        out_specs=pl.BlockSpec((BLK, OUT_LANES), lambda g: (g, 0),
                               memory_space=pltpu.VMEM),
    )(x, *padded_weights)


def fused_mlp_infer(params: dict, feats: jax.Array,
                    out_dim: int = 3) -> jax.Array:
    """feats (N, in_dim) f32 -> (N, out_dim) f32 via the fused kernel.
    Falls back to the reference mlp_apply off-TPU."""
    layers = params["layers"]
    depth = len(layers) - 1
    if not use_fused(depth, layers[0].shape[1]):
        from ..models.nrc.mlp import mlp_apply
        return mlp_apply(params, feats)
    n = feats.shape[0]
    pad = (-n) % BLK
    x = jnp.pad(feats, ((0, pad), (0, 0))) if pad else feats
    padded = pad_weights(layers)
    out = _call(x, padded)
    return out[:n, :out_dim]
