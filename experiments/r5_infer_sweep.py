"""Round-5 (VERDICT item 3): the fused encode+MLP kernel's throughput
curve over hash-table size and block size.

The rowsweep is ~95% of the kernel and its cost is rows x samples x
~3 VPU ops — structurally bound by table size, not schedulable away
(round-4 finding).  The three suggested levers are measured here for the
record: BLK_R > 32 (amortizes only the already-amortized tile slices),
dense-level direct indexing (level 0 is 4/116 of the sweep trips), and
the real lever — the table-size/quality tradeoff: 2^13 matched flagship
MSE within 1.2% in round 4, 2^12 is probed by the quality queue.
"""

import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/experiments")

import jax
import jax.numpy as jnp

from nrc_hpm_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()

from infer_decomp import chain_time_all


def rate(log2_size, n, blk_r):
    from nrc_hpm_tpu.config import AppConfig, EncodingConfig
    from nrc_hpm_tpu.models.nrc.cache import NeuralRadianceCache
    from nrc_hpm_tpu.ops.fused_encode_mlp import fused_encode_mlp_infer

    cfg = AppConfig(encoding=EncodingConfig(log2_hashmap_size=log2_size))
    cache = NeuralRadianceCache(cfg)
    state = cache.init_state(jax.random.PRNGKey(0))
    spec = cache.encoding.grid_spec
    packed = cache.encoding.pack_params(state.ema_params["encoding"])
    x5 = jax.random.uniform(jax.random.PRNGKey(1), (n, 5))

    fn = jax.jit(lambda st, x: fused_encode_mlp_infer(
        packed["hash_table_packed"], st.ema_params["mlp"]["layers"], x,
        spec, blk_r=blk_r))
    dt = chain_time_all(fn, (state, x5), ns=(1, 5))
    print(f"2^{log2_size} blk_r={blk_r:3d}: {dt*1e3:7.2f} ms  "
          f"{n/dt:.3e} samples/s", flush=True)
    return n / dt


def main():
    print("device:", jax.devices()[0], flush=True)
    n = 622592
    for log2 in (14, 13, 12):
        rate(log2, n, 32)
    for blk in (64, 16):
        rate(14, n, blk)
    # full-batch dense (the honest tcnn comparison, VERDICT item 6)
    rate(14, 2073600, 32)
    rate(13, 2073600, 32)


if __name__ == "__main__":
    main()
