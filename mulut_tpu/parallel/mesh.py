"""Device mesh + sharding helpers.

The reference's only multi-device mechanism is single-process
torch.nn.DataParallel over GPUs (ref: sr/1_train_model.py:141-142).  The
TPU-native equivalent is a 1-D `jax.sharding.Mesh` over the batch axis:
params are replicated, batches are sharded, and jit inserts the gradient
psum over ICI automatically.  A second axis ("spatial") is available for
sharding large eval images by rows (see `parallel.spatial`).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "data") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis,))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dimension across the mesh."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, *arrays, axis: str = "data"):
    """device_put host batches with the batch axis sharded over the mesh."""
    sharding = batch_sharding(mesh, axis)
    out = tuple(jax.device_put(a, sharding) for a in arrays)
    return out if len(out) > 1 else out[0]


def replicate_tree(mesh: Mesh, tree):
    sharding = replicated(mesh)
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, sharding), tree)
