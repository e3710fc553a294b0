"""Decompose NRC inference time on the real TPU at the bench's sample count.

Times each stage of cache.infer separately:
  corner-index computation (XLA) / grouped rowsweep gather (Pallas) /
  full packed hash encode / OneBlob+concat+pad / fused MLP / end-to-end.

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/infer_decomp.py [N]
"""
import sys
import time

import jax
import jax.numpy as jnp

from nrc_hpm_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()

from nrc_hpm_tpu.config import AppConfig
from nrc_hpm_tpu.models.nrc.cache import NeuralRadianceCache
from nrc_hpm_tpu.models.nrc import encoding as enc


def chain_time_all(fn, args, ns=(1, 5)):
    """profiler._chain_time, but the no-op token perturbs EVERY arg (float
    AND integer leaves): with only args[0] perturbed, XLA hoists the
    args[1:]-dependent computation out of the scan as loop-invariant and
    the measurement collapses to the non-hoistable remainder."""
    import time as _t

    def tok_of(out):
        t = jnp.float32(0.0)
        for leaf in jax.tree.leaves(out):
            if hasattr(leaf, "dtype"):
                t = t + jnp.sum(leaf).astype(jnp.float32)
        return t * 0.0

    def perturb(a, tok):
        if not hasattr(a, "dtype"):
            return a
        if jnp.issubdtype(a.dtype, jnp.floating):
            return a + tok.astype(a.dtype)
        if jnp.issubdtype(a.dtype, jnp.integer):
            return a + tok.astype(jnp.int32).astype(a.dtype)
        return a

    times = {}
    for n in ns:
        @jax.jit
        def run(args, n=n):
            def body(tok, _):
                cur = jax.tree.map(lambda a: perturb(a, tok), args)
                return tok_of(fn(*cur)), 0
            tok, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
            return tok
        float(run(args))
        t0 = _t.perf_counter()
        float(run(args))
        times[n] = _t.perf_counter() - t0
    n1, n2 = ns
    return max((times[n2] - times[n1]) / (n2 - n1), 0.0)


def timeit(name, fn, *args, n=8):
    """Chained-scan timing: the axon tunnel acks block_until_ready early,
    so naive wall timing measures dispatch only."""
    dt = chain_time_all(lambda *a: fn(*a), args, ns=(1, 5))
    print(f"{name:34s} {dt*1000:9.2f} ms", flush=True)
    return dt


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 622592
    log2 = int(sys.argv[2]) if len(sys.argv) > 2 else 14
    from nrc_hpm_tpu.config import EncodingConfig
    cfg = AppConfig.tpu_tuned(
        encoding=EncodingConfig(log2_hashmap_size=log2))
    cache = NeuralRadianceCache(cfg)
    state = cache.init_state(jax.random.PRNGKey(0))
    spec = cache.encoding.grid_spec
    print(f"device={jax.devices()[0]} N={N} spec levels={spec.n_levels} "
          f"log2={spec.log2_table_size}", flush=True)

    x5 = jax.random.uniform(jax.random.PRNGKey(1), (N, 5))
    pos = x5[:, :3]
    packed = cache.encoding.pack_params(state.ema_params["encoding"])
    ptab = packed["hash_table_packed"]

    # 1. corner indices (lead layout) only
    ci = jax.jit(lambda p: enc._corner_indices_lead(p, spec))
    timeit("corner_indices_lead", ci, pos)

    # 2. sweep kernel alone (indices precomputed)
    idx, w = ci(pos)
    tables = jax.jit(lambda t: enc._levels_table_u32(t, spec))(ptab)
    L = spec.n_levels
    idx_blk = idx.reshape(L, -1, 128)
    swp = jax.jit(lambda t, i: enc._grouped_sweep(t, i, tables.shape[1]))
    timeit("grouped_sweep (gather only)", swp, tables, idx_blk)

    # 3. full packed hash encode
    he = jax.jit(lambda t, p: enc.hash_grid_encode_packed(t, p, spec))
    timeit("hash_grid_encode_packed", he, ptab, pos)

    # 4. full encoding (hash + oneblob + pad)
    fe = jax.jit(lambda prm, x, pk: cache.encoding(prm, x, packed=pk))
    timeit("composite encoding", fe, state.ema_params["encoding"], x5, packed)

    # 5. fused MLP alone
    feats = fe(state.ema_params["encoding"], x5, packed)
    from nrc_hpm_tpu.ops.fused_mlp import fused_mlp_infer
    fm = jax.jit(lambda prm, f: fused_mlp_infer(prm, f, 3))
    timeit("fused_mlp", fm, state.ema_params["mlp"], feats)

    # 6. end-to-end apply (jitted once)
    ap = jax.jit(lambda st, x, pk: cache.apply(st.ema_params, x, packed=pk,
                                               fused=True))
    dt = timeit("end-to-end infer (split)", ap, state, x5, packed)
    print(f"split samples/s: {N/dt:.3e}", flush=True)

    # 7. fully-fused encode+MLP kernel (also report its compile time)
    from nrc_hpm_tpu.ops.fused_encode_mlp import fused_encode_mlp_infer
    fu = jax.jit(lambda pt, prm, x: fused_encode_mlp_infer(
        pt, prm["layers"], x, spec, n_bins=4))
    t0 = time.time()
    jax.block_until_ready(fu(ptab, state.ema_params["mlp"], x5))
    print(f"fused kernel compile+run: {time.time()-t0:.1f}s", flush=True)
    dt = timeit("fused encode+MLP kernel", fu, ptab,
                state.ema_params["mlp"], x5)
    print(f"fused samples/s: {N/dt:.3e}", flush=True)

    # 8. cache.infer (the production entry — picks the fused path on TPU)
    ci2 = jax.jit(cache.infer)
    dt = timeit("cache.infer production", ci2, state, x5)
    print(f"production samples/s: {N/dt:.3e}", flush=True)


if __name__ == "__main__":
    main()
