"""Parameter checkpoint save/resume.

The reference never saves models (SURVEY.md §5: "checkpoint / resume:
none"); this is additive scope for real training runs.  Uses
orbax-checkpoint when importable, with a plain ``np.savez`` pytree fallback
so the feature has no hard dependency.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np


def _flatten(params) -> dict:
    leaves, treedef = jax.tree.flatten(params)
    return {
        "leaves": [np.asarray(leaf) for leaf in leaves],
        "treedef": treedef,
    }


def save(path: str, params: Any, step: int = 0) -> str:
    """Save a params pytree; returns the written path."""
    try:
        import orbax.checkpoint as ocp

        path = os.path.abspath(path)
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path, jax.tree.map(np.asarray, params), force=True)
        ckptr.wait_until_finished()
        return path
    except Exception:
        flat = _flatten(params)
        path = path if path.endswith(".npz") else path + ".npz"
        np.savez(
            path,
            step=step,
            **{f"leaf_{i}": leaf for i, leaf in enumerate(flat["leaves"])},
        )
        return path


def restore(path: str, like: Any) -> Any:
    """Restore a params pytree with the structure of ``like``."""
    if os.path.isdir(path):
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        return ckptr.restore(path, jax.tree.map(np.asarray, like))
    if not path.endswith(".npz") and os.path.exists(path + ".npz"):
        path = path + ".npz"
    with np.load(path) as data:
        leaves, treedef = jax.tree.flatten(like)
        loaded = [data[f"leaf_{i}"] for i in range(len(leaves))]
        for want, got in zip(leaves, loaded):
            if np.shape(want) != got.shape:
                raise ValueError(
                    f"checkpoint shape mismatch: {got.shape} vs {np.shape(want)}"
                )
        return jax.tree.unflatten(treedef, loaded)
