"""Tune the two hot Pallas kernels on the real TPU.

Part 1: fused_encode_mlp blk_r sweep (8/16/32) at the bench's 622592-sample
        inference workload, with an exactness check vs the split path.
Part 2: pw_events UNROLL sweep (1/2/4/8) at a tracking-segment-like shape.

Run: python experiments/kernel_tune.py [n_samples]
"""
import importlib
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from nrc_hpm_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()


def chain_time(fn, args, ns=(1, 5)):
    """Chained-scan timing (see experiments/infer_decomp.py): the axon
    tunnel acks block_until_ready early, so naive wall timing measures
    dispatch, not execution."""
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
        t0 = time.perf_counter()
        float(run(args))
        times[n] = time.perf_counter() - t0
    n1, n2 = ns
    return max((times[n2] - times[n1]) / (n2 - n1), 0.0)


def part1_fused(n_samples: int):
    from nrc_hpm_tpu.config import AppConfig
    from nrc_hpm_tpu.models.nrc.cache import NeuralRadianceCache
    from nrc_hpm_tpu.models.nrc.encoding import pack_table_bf16
    from nrc_hpm_tpu.ops.fused_encode_mlp import fused_encode_mlp_infer

    cfg = AppConfig.tpu_tuned()
    cache = NeuralRadianceCache(cfg)
    state = cache.init_state(jax.random.PRNGKey(0))
    spec = cache.encoding.grid_spec
    x5 = jax.random.uniform(jax.random.PRNGKey(1), (n_samples, 5))
    packed = pack_table_bf16(state.ema_params["encoding"]["hash_table"])
    layers = state.ema_params["mlp"]["layers"]

    # exactness (small slice) vs the split path
    want = np.asarray(cache.apply(state.ema_params, x5[:2048]))
    for blk_r in (8, 16, 32):
        fn = jax.jit(lambda pt, ls, x, b=blk_r: fused_encode_mlp_infer(
            pt, ls, x, spec, n_bins=4, blk_r=b))
        got = np.asarray(fn(packed, layers, x5[:2048]))
        err = np.abs(got - want).max()
        t0 = time.time()
        jax.block_until_ready(fn(packed, layers, x5))
        compile_s = time.time() - t0
        dt = chain_time(lambda pt, ls, x, f=fn: f(pt, ls, x),
                        (packed, layers, x5))
        print(f"blk_r={blk_r:2d}: {dt*1000:8.2f} ms "
              f"{n_samples/max(dt,1e-9):.3e} samples/s  "
              f"maxerr {err:.2e}  (compile {compile_s:.0f}s)", flush=True)


def part2_pw(n_lanes: int = 131072):
    import nrc_hpm_tpu.ops.pw_kernels as pwk
    from nrc_hpm_tpu.volume import Volume

    rs = np.random.RandomState(0)
    vol = Volume.from_dense(rs.rand(32, 32, 32).astype(np.float32),
                            density_factor=0.6, g=0.8)
    start = jnp.asarray(rs.rand(n_lanes, 3).astype(np.float32) * 2 - 1)
    d = rs.randn(n_lanes, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = jnp.asarray(d)
    tmax = jnp.full((n_lanes,), 2.0, jnp.float32)
    seed = jnp.arange(n_lanes, dtype=jnp.uint32)
    el = jnp.zeros((n_lanes,), jnp.float32)

    ref = None
    for unroll in (1, 2, 4, 8):
        pwk.UNROLL = unroll
        jax.clear_caches()
        fn = jax.jit(lambda s, dd, tm, sd, e: pwk.pw_events(
            vol, s, dd, tm, sd, e, 0))
        out = jax.block_until_ready(fn(start, d, tmax, seed, el))
        if ref is None:
            ref = out
        else:
            for k in ref:
                assert np.array_equal(np.asarray(ref[k]),
                                      np.asarray(out[k])), k
        dt = chain_time(lambda s, dd, tm, sd, e, f=fn: f(s, dd, tm, sd, e),
                        (start, d, tmax, seed, el))
        print(f"UNROLL={unroll}: {dt*1000:8.2f} ms for {n_lanes} lanes "
              f"({n_lanes/max(dt,1e-9):.3e} lanes/s)", flush=True)


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 622592
    print(f"device: {jax.devices()[0]}", flush=True)
    part1_fused(n)
    part2_pw()
