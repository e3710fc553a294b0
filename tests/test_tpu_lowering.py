"""TPU-lowering canaries: cross-platform jax.export of every Pallas kernel.

Interpret-mode tests (the rest of the suite) run the kernels as plain JAX
on CPU and CANNOT catch Mosaic lowering failures — a kernel can be
interpret-green yet fail to compile on hardware (e.g. lax.dynamic_slice on
a loaded array has no TC lowering; fori_loop's ``unroll=k`` is rejected for
k not in {1, n}).  ``jax.export.export(fn, platforms=("tpu",))`` runs the
full Mosaic lowering on a CPU host, so these tests fail in CI exactly when
the kernel would fail on the chip."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _export_tpu(fn, *args):
    return jax.export.export(jax.jit(fn), platforms=("tpu",))(*args)


def test_pw_events_lowers_for_tpu(small_volume):
    from nrc_hpm_tpu.ops.pw_kernels import pw_events
    vol = small_volume
    n = 2048
    rs = np.random.RandomState(0)
    start = jnp.asarray(rs.rand(n, 3).astype(np.float32) * 2 - 1)
    d = rs.randn(n, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    exp = _export_tpu(
        lambda s, dd, tm, sd, e: pw_events(vol, s, dd, tm, sd, e, 0),
        start, jnp.asarray(d), jnp.full((n,), 2.0, jnp.float32),
        jnp.arange(n, dtype=jnp.uint32), jnp.zeros((n,), jnp.float32))
    assert exp.mlir_module_serialized


@pytest.mark.parametrize("blk_r", [8, 16, 32])
def test_fused_encode_mlp_lowers_for_tpu(blk_r):
    from nrc_hpm_tpu.config import AppConfig
    from nrc_hpm_tpu.models.nrc.cache import NeuralRadianceCache
    from nrc_hpm_tpu.models.nrc.encoding import pack_table_bf16
    from nrc_hpm_tpu.ops.fused_encode_mlp import fused_encode_mlp_infer

    cfg = AppConfig.tpu_tuned()
    cache = NeuralRadianceCache(cfg)
    state = cache.init_state(jax.random.PRNGKey(0))
    spec = cache.encoding.grid_spec
    packed = pack_table_bf16(state.params["encoding"]["hash_table"])
    x5 = jax.random.uniform(jax.random.PRNGKey(1), (8192, 5))
    exp = _export_tpu(
        lambda pt, ls, x: fused_encode_mlp_infer(
            pt, ls, x, spec, n_bins=4, blk_r=blk_r),
        packed, state.params["mlp"]["layers"], x5)
    assert exp.mlir_module_serialized


def test_fused_mlp_lowers_for_tpu():
    from nrc_hpm_tpu.config import AppConfig
    from nrc_hpm_tpu.models.nrc.cache import NeuralRadianceCache
    from nrc_hpm_tpu.ops.fused_mlp import fused_mlp_infer

    cfg = AppConfig.tpu_tuned()
    cache = NeuralRadianceCache(cfg)
    state = cache.init_state(jax.random.PRNGKey(0))
    feats = jax.random.uniform(
        jax.random.PRNGKey(2),
        (8192, state.params["mlp"]["layers"][0].shape[0]))
    exp = _export_tpu(
        lambda prm, f: fused_mlp_infer(prm, f, 3),
        state.params["mlp"], feats)
    assert exp.mlir_module_serialized


def test_macro_gather_lowers_for_tpu():
    from nrc_hpm_tpu.ops.macro_gather import small_table_lookup
    table = jnp.arange(1024, dtype=jnp.float32)
    idx = jnp.arange(4096, dtype=jnp.int32) % 1024
    exp = _export_tpu(lambda t, i: small_table_lookup(t, i), table, idx)
    assert exp.mlir_module_serialized
