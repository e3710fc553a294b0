"""Calibrate the chained-scan harness: known-FLOPs matmul + n-scaling."""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from experiments.timing import chain_timeit


def main():
    print("device:", jax.devices()[0], flush=True)
    # 4096^3 matmul = 137 GFLOP; v5e bf16 peak ~394 TFLOPs => ~0.35 ms
    a = jax.random.normal(jax.random.PRNGKey(0), (4096, 4096), jnp.bfloat16)
    b = jax.random.normal(jax.random.PRNGKey(1), (4096, 4096), jnp.bfloat16)
    for n in (1, 2, 8):
        chain_timeit(f"matmul 4096^3 n={n}",
                     lambda a, b: jnp.dot(a, b,
                                          preferred_element_type=jnp.float32),
                     a, b, n=n)

    # elementwise on (16, 256K): ~0 work, shows fixed overhead vs n
    x = jax.random.normal(jax.random.PRNGKey(2), (16, 1 << 18))
    for n in (1, 2, 8, 32):
        chain_timeit(f"eltwise (16,256K) n={n}",
                     lambda x: jnp.sqrt(jnp.abs(x)) + 1.0, x, n=n)

    # synthetic map_events again, now with n scaling
    from nrc_hpm_tpu.transmittance import _map_events
    N = 1 << 18
    cum = jnp.cumsum(jax.random.uniform(jax.random.PRNGKey(0), (32, N)),
                     axis=0)
    E = jax.random.uniform(jax.random.PRNGKey(1), (16, N)) * 20.0
    h = jnp.full((N,), 0.3)
    f = jnp.ones((32, N))
    for n in (2, 8):
        chain_timeit(f"map_events synth (16,256K) n={n}",
                     lambda E, cum, h, f: _map_events(E, cum, h, (f,))[0],
                     E, cum, h, f, n=n)


if __name__ == "__main__":
    main()
