"""Per-stage timing — the analog of the reference's 8-query Vulkan
timestamp taxonomy (src/NrcHpmRenderer.cu:1950-1961,495-539: clear,
gen_rays, prep_infer, filter copy, prep_train, NN, render, total).

The production frame is ONE fused XLA program, so stage timing is a
diagnostic mode: each stage is jitted separately and timed with
block_until_ready.  ``jax.profiler`` traces remain available for kernel-
level analysis (profile_trace)."""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict

import jax


class StageTimer:
    def __init__(self):
        self.times_ms: Dict[str, float] = {}

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        yield
        self.times_ms[name] = self.times_ms.get(name, 0.0) \
            + (time.perf_counter() - t0) * 1e3

    def timed(self, name: str, fn: Callable, *args, **kw):
        with self.stage(name):
            out = fn(*args, **kw)
            jax.block_until_ready(out)
        return out

    def report(self) -> str:
        total = sum(self.times_ms.values())
        lines = [f"  {k:<24s} {v:9.2f} ms" for k, v in self.times_ms.items()]
        lines.append(f"  {'total':<24s} {total:9.2f} ms "
                     f"(theoretical fps {1000.0 / max(total, 1e-9):.2f})")
        return "\n".join(lines)


@contextlib.contextmanager
def profile_trace(log_dir: str = "/tmp/jax-trace"):
    """Wrap a region in a jax.profiler trace (view with xprof/tensorboard)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
