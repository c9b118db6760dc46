"""First-class collective-communication API over the device mesh.

The reference's comms layer is NCCL: DDP gradient all-reduce (train.py:83),
SyncBatchNorm stat sync (train.py:81) and a manual all-reduce-mean helper
(components/utils/train_utils.py:30-35 `reduce_tensor`). On TPU the
collectives are XLA ops riding ICI/DCN; this module exposes them as a small
named API so code outside the jit-sharded train step (custom losses, metric
reductions, model-parallel experiments) has one obvious place to reach them.

All functions take the mesh axis *name* and must run inside a
`shard_map`-ed (or pmapped) function over that axis — `under(mesh, fn, ...)`
wraps that plumbing for the common per-shard case.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def psum(x, axis_name: str = "data"):
    """All-reduce sum over the mesh axis (NCCL all_reduce SUM)."""
    return jax.lax.psum(x, axis_name)


def pmean(x, axis_name: str = "data"):
    """All-reduce mean — the reference's `reduce_tensor`
    (train_utils.py:30-35: all_reduce followed by /= world_size)."""
    return jax.lax.pmean(x, axis_name)


def pmax(x, axis_name: str = "data"):
    return jax.lax.pmax(x, axis_name)


def all_gather(x, axis_name: str = "data", axis: int = 0, tiled: bool = True):
    """Gather every shard's x along `axis` (NCCL all_gather). tiled=True
    concatenates along an existing axis; tiled=False stacks a new leading
    device axis."""
    return jax.lax.all_gather(x, axis_name, axis=axis, tiled=tiled)


def reduce_scatter(x, axis_name: str = "data", axis: int = 0):
    """Sum-reduce then scatter shards along `axis` (NCCL reduce_scatter) —
    the building block of ZeRO-style sharded optimizers."""
    return jax.lax.psum_scatter(x, axis_name, scatter_dimension=axis, tiled=True)


def ppermute(x, perm, axis_name: str = "data"):
    """Point-to-point ring/permutation exchange (NCCL send/recv). `perm` is a
    list of (source, destination) pairs; devices not named as a destination
    receive zeros."""
    return jax.lax.ppermute(x, axis_name, perm)


def ring_shift(x, axis_name: str = "data", shift: int = 1):
    """Convenience ppermute: shift shards around the ring by `shift` (the
    pattern of ring-attention / pipeline neighbor exchange)."""
    n = jax.lax.axis_size(axis_name)
    perm = [(i, (i + shift) % n) for i in range(n)]
    return jax.lax.ppermute(x, axis_name, perm)


def axis_index(axis_name: str = "data"):
    return jax.lax.axis_index(axis_name)


def axis_size(axis_name: str = "data"):
    return jax.lax.axis_size(axis_name)


def under(mesh: Mesh, fn, *args, axis_name: str = "data",
          in_specs=None, out_specs=None):
    """Run `fn(*args)` per-shard under `mesh` with the collectives above
    available on `axis_name`. Defaults: inputs sharded on their leading axis,
    outputs replicated (the all-reduce-style contract of the reference's
    reduce_tensor)."""
    shard_map = getattr(jax, "shard_map", None)
    if shard_map is None:  # older jax
        from jax.experimental.shard_map import shard_map

    if in_specs is None:
        in_specs = tuple(P(axis_name) for _ in args)
    if out_specs is None:
        out_specs = P()
    try:
        # the caller owns out_specs correctness; vma can't statically infer
        # replication for every collective (e.g. tiled all_gather)
        mapped = shard_map(fn, mesh=mesh, in_specs=in_specs,
                           out_specs=out_specs, check_vma=False)
    except TypeError:  # older jax spells it check_rep
        mapped = shard_map(fn, mesh=mesh, in_specs=in_specs,
                           out_specs=out_specs, check_rep=False)
    return mapped(*args)
