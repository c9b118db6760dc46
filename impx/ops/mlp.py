"""Pointwise MLP (the reference's Conv1d(k=1) stacks) in [B, N, C] layout.

Mirrors reference nets/layers.py:59-77 `MLP(channels, ac_fn, norm_fn)`:
Conv1d(k=1, bias) -> [norm -> activation] for every layer but the last.
A 1x1 Conv1d over [B, C, N] is exactly a dense matmul over the channel axis,
which is how it is expressed here so XLA maps it straight onto the MXU.
"""
from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp

from impx.ops import norms


def dense_init(key: jax.Array, n_in: int, n_out: int, dtype=jnp.float32) -> dict:
    """torch Conv1d/Linear default init: kaiming_uniform(a=sqrt(5)) => U(+-1/sqrt(fan_in))."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / (n_in ** 0.5)
    return {
        "w": jax.random.uniform(kw, (n_in, n_out), dtype, -bound, bound),
        "b": jax.random.uniform(kb, (n_out,), dtype, -bound, bound),
    }


def dense_apply(p: dict, x: jax.Array) -> jax.Array:
    return jnp.einsum("bnc,cd->bnd", x, p["w"]) + p["b"]


def _activation(x: jax.Array, ac_fn: str) -> jax.Array:
    if ac_fn == "relu":
        return jax.nn.relu(x)
    if ac_fn == "gelu":
        return jax.nn.gelu(x, approximate=False)  # torch nn.GELU default is erf-exact
    if ac_fn == "lrelu":
        return jax.nn.leaky_relu(x, negative_slope=0.1)
    raise ValueError(f"unknown ac_fn {ac_fn!r}")


def mlp_init(
    key: jax.Array,
    channels: Sequence[int],
    norm_fn: str = "in",
    zero_last_bias: bool = False,
    dtype=jnp.float32,
) -> list[dict[str, Any]]:
    """Init the block list. `zero_last_bias` mirrors nn.init.constant_(mlp[-1].bias, 0)."""
    blocks = []
    n = len(channels)
    keys = jax.random.split(key, n - 1)
    for i in range(1, n):
        block = dense_init(keys[i - 1], channels[i - 1], channels[i], dtype)
        if i < n - 1 and norm_fn == "bn":
            c = channels[i]
            block.update(
                bn_scale=jnp.ones((c,), dtype),
                bn_bias=jnp.zeros((c,), dtype),
                bn_mean=jnp.zeros((c,), dtype),
                bn_var=jnp.ones((c,), dtype),
            )
        blocks.append(block)
    if zero_last_bias:
        blocks[-1]["b"] = jnp.zeros_like(blocks[-1]["b"])
    return blocks


def mlp_apply(
    blocks: list[dict[str, Any]],
    x: jax.Array,
    *,
    norm_fn: str = "in",
    ac_fn: str = "relu",
    mask: jax.Array | None = None,
    train: bool = False,
    axis_name: str | None = None,
):
    """Apply the MLP. Returns (y, bn_stats) where bn_stats is a list of
    (batch_mean, batch_var) per BN block in train mode (for running-stat updates);
    empty for norm_fn='in' or eval mode."""
    bn_stats = []
    n = len(blocks)
    for i, block in enumerate(blocks):
        x = dense_apply(block, x)
        if i < n - 1:
            if norm_fn == "in":
                x = norms.instance_norm(x, mask=mask)
            elif norm_fn == "bn":
                if train:
                    x, m, v = norms.batch_norm_train(
                        x, block["bn_scale"], block["bn_bias"], mask=mask, axis_name=axis_name
                    )
                    bn_stats.append((m, v))
                else:
                    x = norms.batch_norm_eval(
                        x, block["bn_scale"], block["bn_bias"], block["bn_mean"], block["bn_var"]
                    )
            elif norm_fn == "none":
                pass
            else:
                raise ValueError(f"unknown norm_fn {norm_fn!r}")
            x = _activation(x, ac_fn)
    return x, bn_stats
