"""Attentional propagation layers (the GNN core of GM/DGNNS/AdaGMN).

Mirrors reference nets/layers.py:139-254: a layer computes an attention
message and passes concat([x, message]) through a 2-layer MLP; the caller adds
the residual. "Shared" layers (IMP attention sharing, SAGNN) reuse the
attention probabilities of the previous layer of the same kind and only
project values (layers.py:182-218).

Params are explicit pytrees; a full stack is a Python list over 2*n_layers
(self, cross alternating), heterogeneous because shared layers carry fewer
weights. The stack is unrolled inside jit — at n_layers<=15 this compiles fast
and lets XLA fuse each layer's projections with the attention einsums.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from impx.ops.attention import attn_init, attention_from_prob, multi_head_attention
from impx.ops.mlp import dense_init, mlp_init, mlp_apply


def layer_init(key: jax.Array, d_model: int, sharing: bool, norm_fn: str = "bn", dtype=jnp.float32) -> dict:
    k1, k2, k3 = jax.random.split(key, 3)
    mlp = mlp_init(k3, [2 * d_model, 2 * d_model, d_model], norm_fn=norm_fn, zero_last_bias=True, dtype=dtype)
    if sharing:
        return {
            "proj": dense_init(k1, d_model, d_model, dtype),
            "merge": dense_init(k2, d_model, d_model, dtype),
            "mlp": mlp,
        }
    return {"attn": attn_init(k1, d_model, dtype), "mlp": mlp}


def layer_apply(
    params: dict,
    x: jax.Array,
    source: jax.Array,
    *,
    num_heads: int,
    ac_fn: str,
    norm_fn: str,
    prob: jax.Array | None = None,
    key_mask: jax.Array | None = None,
    query_mask: jax.Array | None = None,
    train: bool = False,
    axis_name: str | None = None,
    compute_dtype=None,
):
    """Returns (delta, prob, bn_stats). If the layer has shared structure,
    `prob` must be provided and is passed through unchanged."""
    if "attn" in params:
        message, prob = multi_head_attention(
            params["attn"], x, source,
            num_heads=num_heads, key_mask=key_mask, compute_dtype=compute_dtype,
        )
    else:
        assert prob is not None, "shared layer requires a previous attention prob"
        message = attention_from_prob(params, source, prob, num_heads=num_heads)
    y = jnp.concatenate([x, message], axis=-1)
    delta, bn_stats = mlp_apply(
        params["mlp"], y, norm_fn=norm_fn, ac_fn=ac_fn,
        mask=query_mask, train=train, axis_name=axis_name,
    )
    return delta, prob, bn_stats


def stack_init(
    key: jax.Array,
    d_model: int,
    sharing_layers: list[bool],
    norm_fn: str = "bn",
    dtype=jnp.float32,
) -> list[dict]:
    keys = jax.random.split(key, len(sharing_layers))
    return [
        layer_init(keys[i], d_model, sharing_layers[i], norm_fn=norm_fn, dtype=dtype)
        for i in range(len(sharing_layers))
    ]
