"""Device mesh + sharding helpers.

The TPU-native replacement for the reference's NCCL DDP stack
(train.py:49-53 init_process_group, train.py:83 DistributedDataParallel,
train.py:84 DistributedSampler): a 1-D `data` mesh over all chips; the train
step is jit-sharded over it, so gradient reduction is an XLA psum riding ICI
(and DCN across slices) — no hand-written communication.

The matcher is ~12M params, so pure data parallelism is the right layout
(reference trains on 2-4 GPUs at global batch 16); the helpers still expose
general NamedSharding plumbing for wider meshes.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices=None, axis_name: str = "data") -> Mesh:
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def shard_batch(mesh: Mesh, batch, axis_name: str = "data"):
    """Shard every array's leading (batch) axis across the mesh."""
    def _shard(x):
        spec = P(axis_name, *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(_shard, batch)


def replicate(mesh: Mesh, tree):
    """Fully replicate a pytree (params / opt state) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def batch_sharding(mesh: Mesh, axis_name: str = "data"):
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh):
    return NamedSharding(mesh, P())
