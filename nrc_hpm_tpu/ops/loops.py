"""Manually partial-unrolled fori_loop for Pallas TPU kernels.

Mosaic's fori_loop lowering accepts only ``unroll=1`` or a full unroll
(jax/_src/pallas/mosaic/lowering.py _lower_jaxpr_to_for_loop), so
``jax.lax.fori_loop(..., unroll=k)`` cannot express the middle ground the
tracking kernels need: full unrolls traced ~10k primitives per kernel
(~150 s of 1080p trace time across call-site shapes) while unroll=1
serializes the VPU (~35% slower frames).  This helper runs an unroll=1
outer loop whose body inlines ``unroll`` statically-offset steps, plus a
statically-peeled remainder — the generated code matches a partial unroll.
"""

from __future__ import annotations

import jax


def unrolled_fori(n: int, body, init, unroll: int):
    """``jax.lax.fori_loop(0, n, body, init)`` with manual partial unroll.

    ``n`` and ``unroll`` must be static ints; ``body(i, carry) -> carry``
    sees ``i`` as a traced int32 in the main loop and a Python int in the
    peeled remainder.
    """
    u = max(1, min(unroll, n))
    main = (n // u) * u
    carry = init

    if main:
        def outer(o, carry):
            base = o * u
            for k in range(u):
                carry = body(base + k, carry)
            return carry

        carry = jax.lax.fori_loop(0, n // u, outer, carry)
    for i in range(main, n):
        carry = body(i, carry)      # Python int: static ds offsets
    return carry
