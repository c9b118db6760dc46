"""Pipeline parallelism: GPipe-style microbatch pipeline over the layer scan.

The reference has no model parallelism at all (SURVEY §2.7); impx's scan fast
path (impx/models/fast.py) already compiles the 15-iteration matcher into one
`lax.scan` over stacked per-layer parameters, which makes stage-sharding
natural: shard the leading layer axis of the stacked self/cross trees over a
`stage` mesh axis, keep one in-flight microbatch per stage, and rotate the
scan carry (descriptors + attention-sharing q/k state) to the next stage with
`ppermute` after each step. The schedule is plain GPipe forward:

    step t:  stage s processes microbatch (t - s);  total steps M + S - 1

Stage 0 injects a fresh encoded microbatch each step; the last stage's
outputs are collected into the result buffer and psum-broadcast at the end.
Bubble steps compute garbage that is never collected (standard GPipe).

The attention-sharing state rides the carry, so a sharing layer whose source
layer lives on the previous stage still sees the right q/k projections —
stage boundaries are transparent to the IMP sharing pattern.

This is an eval/throughput construct (only_last forward). It matters when
the per-stage weights or activation working set outgrow one chip — not at
the published 12M-param config, where DP is the production layout — but the
mechanism is real and tested bit-exact against the single-device scan.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

STAGE_AXIS = "stage"


def make_stage_mesh(n_stages: int, devices=None,
                    axis_name: str = STAGE_AXIS) -> Mesh:
    if devices is None:
        devices = jax.devices()
    if len(devices) < n_stages:
        raise ValueError(f"need {n_stages} devices, have {len(devices)}")
    return Mesh(np.asarray(devices[:n_stages]), (axis_name,))


def _shard_map(fn, mesh, in_specs, out_specs):
    shard_map = getattr(jax, "shard_map", None)
    if shard_map is None:  # older jax
        from jax.experimental.shard_map import shard_map
    try:
        return shard_map(fn, mesh=mesh, in_specs=in_specs,
                         out_specs=out_specs, check_vma=False)
    except TypeError:  # older jax spells it check_rep
        return shard_map(fn, mesh=mesh, in_specs=in_specs,
                         out_specs=out_specs, check_rep=False)


def pipeline_forward_scan(
    model,
    stacked: dict,
    data: dict[str, Any],
    mesh: Mesh,
    *,
    n_microbatches: int = 2,
    p: float = 0.2,
    with_scores: bool = True,
    axis_name: str = STAGE_AXIS,
):
    """DGNNS produce_matches(only_last=True) pipelined over `mesh`'s stage
    axis. Semantically identical to fast.forward_scan; requires
    n_layers % n_stages == 0 and batch % n_microbatches == 0."""
    from impx.models.fast import (_attn_block, _interpret,
                                  final_matches_from_desc)

    cfg = model.config
    assert cfg.norm_fn == "in", "scan fast path supports norm_fn='in' only"
    interpret = _interpret()
    compute_dtype = model.compute_dtype

    n_stages = mesh.shape[axis_name]
    if cfg.n_layers % n_stages:
        raise ValueError(f"n_layers={cfg.n_layers} not divisible by "
                         f"{n_stages} stages")

    valid0 = data.get("valid0")
    valid1 = data.get("valid1")
    b, n = data["descriptors0"].shape[:2]
    if valid0 is None:
        valid0 = jnp.ones((b, n), bool)
    if valid1 is None:
        valid1 = jnp.ones((b, data["descriptors1"].shape[1]), bool)

    m = n_microbatches
    if b % m:
        raise ValueError(f"batch={b} not divisible by {m} microbatches")
    bmb = b // m

    enc0, _ = model.encode_keypoint(
        {"kenc": stacked["kenc"]}, data["norm_keypoints0"], data["scores0"],
        valid0)
    enc1, _ = model.encode_keypoint(
        {"kenc": stacked["kenc"]}, data["norm_keypoints1"], data["scores1"],
        valid1)
    d0 = data["descriptors0"] + enc0
    d1 = data["descriptors1"] + enc1
    if compute_dtype is not None:
        d0, d1 = d0.astype(compute_dtype), d1.astype(compute_dtype)

    # microbatch stacks: [M, 2*bmb, N, ...] — image0 then image1 halves,
    # mirroring forward_scan's stacked-batch layout per microbatch
    def mb_stack(x0, x1):
        x0 = x0.reshape(m, bmb, *x0.shape[1:])
        x1 = x1.reshape(m, bmb, *x1.shape[1:])
        return jnp.concatenate([x0, x1], axis=1)

    desc_mbs = mb_stack(d0, d1)                      # [M, 2bmb, N, D]
    mask_mbs = mb_stack(valid0, valid1)              # [M, 2bmb, N]
    mask_swap_mbs = mb_stack(valid1, valid0)

    h = cfg.num_heads
    dh = cfg.descriptor_dim // h
    qk_dtype = compute_dtype or jnp.float32

    def swap(x):
        return jnp.concatenate([x[bmb:], x[:bmb]], axis=0)

    def stage_fn(self_stack, cross_stack, desc_mbs, mask_mbs, mask_swap_mbs):
        s = jax.lax.axis_index(axis_name)
        n_steps = m + n_stages - 1

        def layer_body(carry, per_it):
            desc, qk_self, qk_cross, mask, mask_swap = carry
            delta, qk_self = _attn_block(
                per_it["self"], desc, desc, qk_self, mask, mask,
                h, cfg.ac_fn, compute_dtype, interpret)
            desc = desc + delta
            delta, qk_cross = _attn_block(
                per_it["cross"], desc, swap(desc), qk_cross, mask_swap, mask,
                h, cfg.ac_fn, compute_dtype, interpret)
            desc = desc + delta
            return (desc, qk_self, qk_cross, mask, mask_swap), None

        zero_qk = {
            "q": jnp.zeros((2 * bmb, h, n, dh), qk_dtype),
            "k": jnp.zeros((2 * bmb, h, n, dh), qk_dtype),
        }
        state = (jnp.zeros((2 * bmb, n, cfg.descriptor_dim),
                           desc_mbs.dtype), zero_qk, zero_qk)
        outputs = jnp.zeros((m, 2 * bmb, n, cfg.descriptor_dim),
                            desc_mbs.dtype)
        fwd_perm = [(i, i + 1) for i in range(n_stages - 1)]

        def step(carry, t):
            state, outputs = carry
            # hand the previous step's carry to the next stage
            received = jax.tree.map(
                lambda x: jax.lax.ppermute(x, axis_name, fwd_perm), state)
            # stage 0 injects a fresh microbatch; bubble steps recompute the
            # last microbatch (garbage, never collected)
            inj = jax.lax.dynamic_index_in_dim(
                desc_mbs, jnp.clip(t, 0, m - 1), 0, keepdims=False)
            fresh = (inj, zero_qk, zero_qk)
            state_in = jax.tree.map(
                lambda f, r: jnp.where(s == 0, f, r), fresh, received)
            # this stage is processing microbatch t - s
            mb = jnp.clip(t - s, 0, m - 1)
            mask = jax.lax.dynamic_index_in_dim(mask_mbs, mb, 0,
                                                keepdims=False)
            mask_swap = jax.lax.dynamic_index_in_dim(mask_swap_mbs, mb, 0,
                                                     keepdims=False)
            per_it = {"self": self_stack, "cross": cross_stack}
            (desc, qk_s, qk_c, _, _), _ = jax.lax.scan(
                layer_body, (*state_in, mask, mask_swap), per_it)
            # collect finished microbatches on the last stage
            take = (s == n_stages - 1) & (t - s >= 0) & (t - s < m)
            cur = jax.lax.dynamic_index_in_dim(outputs, mb, 0, keepdims=False)
            new = jnp.where(take, desc, cur)
            outputs = jax.lax.dynamic_update_index_in_dim(outputs, new, mb, 0)
            return ((desc, qk_s, qk_c), outputs), None

        (state, outputs), _ = jax.lax.scan(
            step, (state, outputs), jnp.arange(n_steps))
        # only the last stage wrote real outputs; broadcast them everywhere
        is_last = (s == n_stages - 1).astype(outputs.dtype)
        return jax.lax.psum(outputs * is_last, axis_name)

    mapped = _shard_map(
        stage_fn, mesh,
        in_specs=(P(axis_name), P(axis_name), P(), P(), P()),
        out_specs=P())
    outputs = mapped(stacked["self"], stacked["cross"], desc_mbs, mask_mbs,
                     mask_swap_mbs)

    # [M, 2bmb, ...] -> stacked-batch [2B, ...] (image0 halves then image1)
    out0 = outputs[:, :bmb].reshape(b, n, cfg.descriptor_dim)
    out1 = outputs[:, bmb:].reshape(b, n, cfg.descriptor_dim)
    desc = jnp.concatenate([out0, out1], axis=0)
    return final_matches_from_desc(model, stacked, desc, b, valid0, valid1,
                                   p, with_scores, interpret)
