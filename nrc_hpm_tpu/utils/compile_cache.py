"""Persistent XLA compilation cache.

The reference compiles GLSL at startup by shelling out to glslc
(/root/reference/src/Shader.cpp:18-40) and pays it on every run; our XLA
programs are far bigger (the whole NRC frame is one program) and the axon
remote-compile tunnel makes cold compiles minutes-long.  JAX's persistent
compilation cache makes every compile after the first process-lifetime
cheap: measured 1.8 s -> 0.24 s across processes for a toy program, and it
applies to the full staged NRC step as well.

Enabled by every entry point (app, bench, graft entry, tests).  Set
NRC_NO_COMPILE_CACHE=1 to disable.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "output", "xla_cache")


def enable_compilation_cache(path: str | None = None) -> str | None:
    """Point JAX's persistent compilation cache at ``path`` (default:
    <repo>/output/xla_cache).  Safe to call multiple times."""
    if os.environ.get("NRC_NO_COMPILE_CACHE"):
        return None
    import jax

    path = path or os.environ.get("NRC_COMPILE_CACHE_DIR", _DEFAULT_DIR)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # cache everything that takes >=1s to compile (the default threshold);
    # tiny programs recompile faster than they (de)serialize
    return path
