"""Checkpoint / resume for progressive renders and inverse-rendering fits.

The reference had no persistence at all — its only evolving state was the
progressive accumulator, lost on exit (SURVEY.md §5 "Checkpoint/resume:
none"). Here the accumulator (+ sample count, RNG frame counter, and any
optimizer parameters) is a pytree saved with orbax when available, with a
dependency-free ``.npz`` fallback.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import numpy as np


def _flatten(tree: Any) -> Tuple[Dict[str, np.ndarray], Any]:
    import jax

    leaves, treedef = jax.tree_util.tree_flatten(tree)
    arrays = {f"leaf_{i}": np.asarray(leaf) for i, leaf in enumerate(leaves)}
    return arrays, treedef


def save(path: str, tree: Any, meta: Optional[dict] = None) -> None:
    """Save a pytree checkpoint. ``path`` is a directory.

    The npz fallback engages only when orbax is *not importable*; a real
    orbax save failure (corrupt state, version skew) propagates — silently
    degrading would make it indistinguishable from orbax-not-installed.
    """
    os.makedirs(path, exist_ok=True)
    try:
        import orbax.checkpoint as ocp
    except ImportError:
        ocp = None
    if ocp is not None:
        ckpt = ocp.PyTreeCheckpointer()
        ckpt.save(os.path.join(path, "state"), tree, force=True)
        backend = "orbax"
    else:
        arrays, _ = _flatten(tree)
        np.savez(os.path.join(path, "state.npz"), **arrays)
        backend = "npz"
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump({"backend": backend, **(meta or {})}, f)


def restore(path: str, like: Any) -> Tuple[Any, dict]:
    """Restore a checkpoint into the structure of ``like``.

    Returns (tree, meta). ``like`` provides the pytree structure (and, for
    the npz fallback, leaf order)."""
    import jax

    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    if meta.get("backend") == "orbax":
        import orbax.checkpoint as ocp

        ckpt = ocp.PyTreeCheckpointer()
        tree = ckpt.restore(os.path.join(path, "state"), item=like)
        return tree, meta
    data = np.load(os.path.join(path, "state.npz"))
    leaves, treedef = jax.tree_util.tree_flatten(like)
    new_leaves = [data[f"leaf_{i}"] for i in range(len(leaves))]
    return jax.tree_util.tree_unflatten(treedef, new_leaves), meta
