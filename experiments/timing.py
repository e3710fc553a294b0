"""Shared timing harness for TPU experiments.

The axon tunnel acks ``block_until_ready`` before device execution actually
finishes (measured: 5 queued identical 2M-sample infers "complete" in
0.2 ms; forcing a data dependency between them shows ~500 ms each).  The
only trustworthy protocol is to run ``n`` iterations inside ONE jitted
program with a serializing data dependency, block once, and divide.
"""

import time

import jax
import jax.numpy as jnp


def chain_timeit(name, fn, *args, n=3, warmup=True):
    """Time ``fn(*args)`` by scanning n chained iterations in one jit.

    A scalar token derived from each iteration's output is folded into the
    first float input of the next iteration (+0.0 at runtime), forcing
    sequential execution on device.  Prints mean ms per iteration.
    """

    def tok_of(out):
        # FULL reduction over every output leaf: a token built from a
        # single element lets XLA slice the whole iteration down to the
        # one-element dependency cone (measured: a 137-GFLOP matmul "ran"
        # in 0.02 ms that way).  jnp.sum forces materializing everything.
        leaves = [l for l in jax.tree.leaves(out) if hasattr(l, "dtype")]
        t = jnp.float32(0.0)
        for l in leaves:
            t = t + jnp.sum(l).astype(jnp.float32)
        # collapse to a runtime 0 that XLA cannot constant-fold
        return t * 0.0

    def perturb(a, tok):
        if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating):
            return a + tok.astype(a.dtype)
        return a

    @jax.jit
    def run(args):
        def body(tok, _):
            cur = list(args)
            # fold the token into every float leaf of the first arg
            cur[0] = jax.tree.map(lambda a: perturb(a, tok), cur[0])
            out = fn(*cur)
            return tok_of(out), 0
        tok, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
        return tok

    if warmup:
        float(run(args))  # D2H fetch: the tunnel acks block_until_ready
    t0 = time.perf_counter()  # before execution finishes; a value fetch
    float(run(args))          # cannot be served early
    dt = (time.perf_counter() - t0) / n
    print(f"{name:<44s} {dt*1e3:9.2f} ms", flush=True)
    return dt


def chain_timeit2(name, fn, *args, ns=(2, 16), quiet=False):
    """Calibrated chain timing: runs ``fn`` chained n1 and n2 times inside
    one jit each and solves for (fixed call overhead, per-iteration time).
    The axon tunnel adds ~33 ms of fixed latency per jit invocation, which
    chain_timeit at small n smears into the per-iteration number."""

    def tok_of(out):
        leaves = [l for l in jax.tree.leaves(out) if hasattr(l, "dtype")]
        t = jnp.float32(0.0)
        for l in leaves:
            t = t + jnp.sum(l).astype(jnp.float32)
        return t * 0.0

    def perturb(a, tok):
        if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating):
            return a + tok.astype(a.dtype)
        return a

    times = {}
    for n in ns:
        @jax.jit
        def run(args, n=n):
            def body(tok, _):
                cur = list(args)
                cur[0] = jax.tree.map(lambda a: perturb(a, tok), cur[0])
                out = fn(*cur)
                return tok_of(out), 0
            tok, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
            return tok
        float(run(args))
        t0 = time.perf_counter()
        float(run(args))
        times[n] = time.perf_counter() - t0
    n1, n2 = ns
    per = (times[n2] - times[n1]) / (n2 - n1)
    fixed = times[n1] - n1 * per
    if not quiet:
        print(f"{name:<44s} {per*1e3:9.3f} ms (+{fixed*1e3:.1f} fixed)",
              flush=True)
    return per


def wall_timeit(name, fn, *args, n=3, warmup=1):
    """Wall-clock with per-call block (includes tunnel latency; use only
    for full frames where the state chains naturally)."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    out = None
    for _ in range(n):
        out = jax.block_until_ready(fn(*args))
    dt = (time.perf_counter() - t0) / n
    print(f"{name:<44s} {dt*1e3:9.2f} ms", flush=True)
    return out
