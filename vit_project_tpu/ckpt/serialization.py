"""Checkpoint serialization.

Pytrees of jax/numpy arrays <-> single files. File names keep the reference's
layout (`epoch{N}_dora_params.pth`, `epoch{N}_random_states.pth`,
`dataset_split_indices.pth`, `checkpoint_epoch_{N:03d}.pth` — SURVEY.md
section 2.3) so directory structures remain drop-in compatible with the analysis
tooling; the container format is a self-describing npz-in-pickle, not torch.
"""
from __future__ import annotations

import os
import pickle

import numpy as np


def _to_host(obj):
    """Recursively convert jax arrays to numpy for pickling."""
    import jax
    if isinstance(obj, jax.Array):
        return np.asarray(obj)
    if isinstance(obj, dict):
        return {k: _to_host(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        t = type(obj)
        out = [_to_host(v) for v in obj]
        if hasattr(obj, "_fields"):  # NamedTuple (e.g. optax states)
            return t(*out)
        return t(out)
    return obj


def save(path: str, tree) -> None:
    d = os.path.dirname(path)
    if d:
        os.makedirs(d, exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(_to_host(tree), f, protocol=4)
    os.replace(tmp, path)  # atomic: a crash never leaves a truncated checkpoint


def load(path: str):
    with open(path, "rb") as f:
        return pickle.load(f)


def tree_equal(a, b) -> bool:
    import jax
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    if len(la) != len(lb):
        return False
    return all(np.array_equal(np.asarray(x), np.asarray(y))
               for x, y in zip(la, lb))
