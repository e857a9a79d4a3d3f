"""Device mesh + sharding utilities.

TPU-native replacement for the reference's NCCL/DDP machinery (setup_distributed +
DistributedSampler + all_reduce, train_vit_sgd.py:13-27,125-204; SURVEY.md
section 2.2): a 1-D data mesh over ICI (optionally 2-D with a model axis for
future tensor parallelism), batches sharded over the 'data' axis with pjit, and
gradient/metric reductions inserted by XLA from the sharded loss — no hand-written
collectives.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: int | None = None, n_model: int = 1,
              devices=None) -> Mesh:
    """1-D ('data',) mesh by default; ('data','model') if n_model > 1."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices) if n_data is None else n_data * n_model
    devices = devices[:n]
    if n_model > 1:
        arr = mesh_utils.create_device_mesh((n // n_model, n_model),
                                            devices=devices)
        return Mesh(arr, ("data", "model"))
    arr = mesh_utils.create_device_mesh((len(devices),), devices=devices)
    return Mesh(arr, ("data",))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Leading axis sharded over 'data'."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree):
    """Place a host batch onto the mesh, leading axis split over 'data'."""
    s = data_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), tree)


def replicate(mesh: Mesh, tree):
    s = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), tree)


def pad_to_multiple(batch_tree, multiple: int):
    """Pad the leading axis to a multiple (for even data sharding); returns
    (padded_tree, real_count). Loss/metric code weights by real_count."""
    leaves = jax.tree_util.tree_leaves(batch_tree)
    n = leaves[0].shape[0]
    pad = (-n) % multiple
    if pad == 0:
        return batch_tree, n
    def _pad(x):
        widths = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
        return np.pad(np.asarray(x), widths)
    return jax.tree_util.tree_map(_pad, batch_tree), n
