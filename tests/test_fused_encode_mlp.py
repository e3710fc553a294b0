"""Fused encode+MLP inference kernel vs the split-path oracle.

The kernel (ops/fused_encode_mlp.py) must reproduce
hash_grid_encode_packed + one_blob_encode + ones-padding + mlp_apply
exactly up to corner-summation order and one bf16 rounding step.
the CPU test platform; the same kernel compiles natively on TPU.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nrc_hpm_tpu.config import AppConfig, EncodingConfig, SceneConfig
from nrc_hpm_tpu.models.nrc.cache import NeuralRadianceCache
from nrc_hpm_tpu.models.nrc.encoding import pack_table_bf16
from nrc_hpm_tpu.models.nrc.mlp import mlp_apply
from nrc_hpm_tpu.ops.fused_encode_mlp import fused_encode_mlp_infer


def _cache(**enc_kw):
    enc = dict(n_levels=8, log2_hashmap_size=12)
    enc.update(enc_kw)
    cfg = AppConfig(
        scene=SceneConfig.preset(4),
        nn_width=64, nn_depth=3,
        encoding=EncodingConfig(**enc))
    return NeuralRadianceCache(cfg)


def _oracle(cache, state, x5):
    packed = cache.encoding.pack_params(state.ema_params["encoding"])
    feats = cache.encoding(state.ema_params["encoding"], x5, packed=packed)
    return mlp_apply(state.ema_params["mlp"], feats)


@pytest.mark.parametrize("blk_r", [8, 16])
@pytest.mark.parametrize("n", [512, 1000])
def test_fused_matches_split_path(n, blk_r):
    cache = _cache()
    state = cache.init_state(jax.random.PRNGKey(0))
    # inputs spanning in-range and the reference's out-of-range theta
    x5 = jax.random.uniform(jax.random.PRNGKey(1), (n, 5),
                            minval=-0.4, maxval=1.4)
    want = np.asarray(_oracle(cache, state, x5))
    packed = pack_table_bf16(state.ema_params["encoding"]["hash_table"])
    got = np.asarray(fused_encode_mlp_infer(
        packed, state.ema_params["mlp"]["layers"], x5,
        cache.encoding.grid_spec, n_bins=4, blk_r=blk_r, interpret=True))
    assert got.shape == (n, 3)
    assert np.allclose(got, want, atol=1e-2), np.abs(got - want).max()


def test_fused_16_levels_default_spec():
    cache = _cache(n_levels=16, log2_hashmap_size=13)
    state = cache.init_state(jax.random.PRNGKey(2))
    x5 = jax.random.uniform(jax.random.PRNGKey(3), (512, 5))
    want = np.asarray(_oracle(cache, state, x5))
    packed = pack_table_bf16(state.ema_params["encoding"]["hash_table"])
    got = np.asarray(fused_encode_mlp_infer(
        packed, state.ema_params["mlp"]["layers"], x5,
        cache.encoding.grid_spec, n_bins=4, interpret=True))
    assert np.allclose(got, want, atol=1e-2), np.abs(got - want).max()
