"""Checkpoint save/restore for arbitrary parameter pytrees.

The reference saves torch state_dicts at fixed intervals and rebuilds
tensors at checkpoint shapes on load (OmniRe base.py:638-713,
vanilla.py:454-463; S3 capture/restore gaussian_model.py:74-118).  Here the
whole train state (params + optimizer moments + alive masks + step) is one
pytree at *static capacity*, so save/restore is exact and shape-stable:
flatten with key paths -> one npz. Orbax is available for async multi-host
checkpointing later; npz keeps round-1 checkpoints dependency-free and
inspectable.
"""
from __future__ import annotations

import os
import re

import numpy as np

import jax


def _flatten(tree):
    flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
    out = {}
    for path, leaf in flat:
        key = jax.tree_util.keystr(path)
        out[key] = np.asarray(leaf)
    return out, treedef


def save_checkpoint(path: str, tree) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    flat, _ = _flatten(tree)
    safe = {re.sub(r"[^\w.\[\]']+", "_", k): v for k, v in flat.items()}
    np.savez_compressed(path, **safe)


def load_checkpoint(path: str, target):
    """Restore into the structure of `target` (shapes must match — static
    capacity makes that hold by construction)."""
    data = np.load(path, allow_pickle=False)
    flat, treedef = jax.tree_util.tree_flatten_with_path(target)
    leaves = []
    for p, leaf in flat:
        key = re.sub(r"[^\w.\[\]']+", "_", jax.tree_util.keystr(p))
        arr = data[key]
        if arr.shape != np.shape(leaf):
            raise ValueError(
                f"checkpoint leaf {key}: shape {arr.shape} != "
                f"{np.shape(leaf)}")
        leaves.append(arr.astype(np.asarray(leaf).dtype))
    return jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(target), leaves)
