"""Checkpoint / resume for the NRC cache and renderer state.

NEW capability: the reference never serializes the network — the cache
retrains from scratch every run (SURVEY §5 "Checkpoint/resume: None").
We save the full NrcState pytree (params, EMA params, optimizer moments,
step) as a flat .npz so runs can resume and frozen-cache evaluation
(BASELINE config 3) has something to load.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


def _flatten(tree: Any, prefix: str = ""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}{i}/"))
    else:
        out[prefix.rstrip("/")] = np.asarray(tree)
    return out


def save_pytree(path: str, tree: Any) -> None:
    """Save an arbitrary pytree of arrays as a flat npz keyed by tree path."""
    leaves, treedef = jax.tree.flatten(tree)
    arrays = {f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)}
    arrays["__treedef__"] = np.frombuffer(
        str(treedef).encode(), dtype=np.uint8)
    np.savez_compressed(path, **arrays)


def load_pytree(path: str, like: Any) -> Any:
    """Load arrays saved by save_pytree into the structure of ``like``.

    Structure comes from ``like`` (so optimizer pytrees with custom nodes
    restore cleanly), but the STORED treedef string must match ``like``'s:
    same-shaped leaves under a different structure (e.g. a changed
    optimizer config between save and load) are rejected instead of being
    silently misassigned."""
    data = np.load(path, allow_pickle=False)
    leaves, treedef = jax.tree.flatten(like)
    if "__treedef__" in data:
        stored = bytes(data["__treedef__"].tobytes()).decode()
        if stored != str(treedef):
            raise ValueError(
                f"checkpoint {path} was saved with a different pytree "
                f"structure than the target:\n  saved:  {stored[:200]}\n"
                f"  target: {str(treedef)[:200]}")
    n = len(leaves)
    loaded = []
    for i in range(n):
        key = f"leaf_{i}"
        if key not in data:
            raise ValueError(
                f"checkpoint {path} has {len(data)-1} leaves, need {n}")
        arr = data[key]
        want = np.asarray(leaves[i])
        if arr.shape != want.shape:
            raise ValueError(
                f"checkpoint leaf {i}: shape {arr.shape} != {want.shape}")
        loaded.append(jnp.asarray(arr.astype(want.dtype, copy=False)))
    return jax.tree.unflatten(treedef, loaded)
