"""Tensor-parallel (2-D data x model mesh) sharding for the matcher.

The reference's only parallelism is NCCL data parallelism (train.py:83 DDP);
impx's production layout is likewise the 1-D data mesh in mesh.py (the matcher
is ~12M params). This module adds the *model* axis as a first-class option so
the same train/eval step can run Megatron-style tensor parallelism over a
`(data, model)` mesh — the capability matters for scaled-up variants (wider
descriptors, more heads) even though the published config doesn't need it.

Design (pure GSPMD: we only annotate parameter shardings, XLA inserts the
collectives):

- attention q/k/v (and the shared-layer value `proj`): column-parallel —
  weight [D_in, D_out] sharded on D_out. The head split in
  impx/ops/attention.py is head-minor (channel c = d*H + h), so a contiguous
  shard of output channels is a contiguous shard of the per-head feature dim
  `d` across ALL heads: every device holds a d-slice of q/k/v for every head,
  the qk^T contraction psums over `model`, softmax is replicated, and the
  prob@v einsum leaves the output d-sharded = channel-sharded.
- attention `merge`: row-parallel — weight sharded on D_in (which arrives
  channel-sharded from the value path), psum on the output.
- MLP / keypoint-encoder chains: alternating column/row parallel
  (Megatron MLP). InstanceNorm/BatchNorm between layers normalize over
  batch/keypoints *per channel*, so channel-sharded activations flow through
  them with zero communication.
- final_proj, bin_score, norm affine params: replicated (small).

Everything else (batch axes) shards over `data` exactly as the 1-D path.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_2d_mesh(n_data: int, n_model: int, devices=None,
                 axis_names=(DATA_AXIS, MODEL_AXIS)) -> Mesh:
    """A (data, model) mesh. On real hardware lay `model` along the
    fastest ICI dimension (it carries the per-layer psums); the data axis
    tolerates DCN."""
    if devices is None:
        devices = jax.devices()
    n = n_data * n_model
    if len(devices) < n:
        raise ValueError(f"need {n} devices, have {len(devices)}")
    grid = np.asarray(devices[:n]).reshape(n_data, n_model)
    return Mesh(grid, axis_names)


def _dense_chain_specs(blocks: list, model_axis: str) -> list:
    """Alternating column/row parallel specs for a chain of dense blocks
    (each {'w': [in,out], 'b': [out], optional bn_*: [out]}). The last block
    is row-parallel when it lands on an odd index (its input arrives
    channel-sharded) and replicated otherwise — either way its output is
    replicated, so downstream consumers see the unsharded activation."""
    specs = []
    last = len(blocks) - 1
    for i, block in enumerate(blocks):
        if i % 2 == 0 and i == last:
            # chain ends on an even index: replicate the last block
            spec = {k: P() for k in block}
        elif i % 2 == 0:
            spec = {k: (P(None, model_axis) if k == "w" else P(model_axis))
                    for k in block}
        else:
            # row-parallel: output (and bn over the output) replicated
            spec = {k: (P(model_axis, None) if k == "w" else P())
                    for k in block}
        specs.append(spec)
    return specs


def _attn_specs(attn: dict, model_axis: str) -> dict:
    spec = {}
    for name, p in attn.items():
        if name == "merge":
            spec[name] = {"w": P(model_axis, None), "b": P()}
        else:  # q / k / v / proj: column-parallel
            spec[name] = {"w": P(None, model_axis), "b": P(model_axis)}
    return spec


def matcher_param_specs(params: dict, model_axis: str = MODEL_AXIS) -> dict:
    """PartitionSpec pytree (same structure as `params`) for GM/DGNNS/AdaGMN
    parameter trees produced by GM.init (impx/models/gm.py:40-55)."""
    specs: dict = {}
    for key, val in params.items():
        if key == "gnn":
            specs[key] = [
                {"attn": _attn_specs(layer["attn"], model_axis),
                 "mlp": _dense_chain_specs(layer["mlp"], model_axis)}
                for layer in val
            ]
        elif key == "kenc":
            specs[key] = _dense_chain_specs(val, model_axis)
        else:
            # final_proj, bin_score, anything small: replicated
            specs[key] = jax.tree.map(lambda _: P(), val)
    return specs


def shard_by_specs(mesh: Mesh, tree, specs):
    """device_put every leaf with its NamedSharding. `specs` must mirror
    `tree`'s structure (use matcher_param_specs for matcher params)."""
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), tree, specs,
        is_leaf=lambda x: x is None)


def shard_params_tp(mesh: Mesh, params: dict, model_axis: str = MODEL_AXIS):
    """Shard a matcher param tree tensor-parallel over `mesh`'s model axis
    (batch axes are handled separately by mesh.shard_batch over `data`).
    Optimizer state initialized from the returned params inherits the
    shardings (optax moments are zeros_like of the params)."""
    return shard_by_specs(mesh, params, matcher_param_specs(params, model_axis))


# ------------------------------------------------------------------ sequence parallel

_SEQ_KEYS = ("descriptors0", "descriptors1", "keypoints0", "keypoints1",
             "norm_keypoints0", "norm_keypoints1", "scores0", "scores1")


def shard_batch_sp(mesh: Mesh, batch: dict, data_axis: str = DATA_AXIS,
                   seq_axis: str = MODEL_AXIS) -> dict:
    """Sequence parallelism: shard the KEYPOINT axis of the per-image feature
    arrays over the mesh's second axis, on top of batch sharding over `data`.

    Params stay replicated (they are tiny); activations [B, N, D] enter
    N-sharded and GSPMD inserts the all-gathers where an op genuinely needs
    the full keypoint set (attention keys, Sinkhorn rows) while everything
    pointwise (projections, MLPs, norms over channels) stays N-local. This is
    the TPU analogue of context parallelism — useful when N grows past what
    one chip's VMEM-friendly attention tile wants, and the same mechanism
    EIMP's token pruning works against (SURVEY §5.7).

    Arrays whose second axis is not the keypoint axis (matching_mask's N+1
    rows, intrinsics, poses) shard over `data` only."""
    def _shard(key, x):
        if key in _SEQ_KEYS and x.ndim >= 2:
            spec = P(data_axis, seq_axis, *([None] * (x.ndim - 2)))
        else:
            spec = P(data_axis, *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return {k: _shard(k, np.asarray(v)) for k, v in batch.items()}
