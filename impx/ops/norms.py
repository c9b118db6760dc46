"""Normalization layers in [B, N, C] layout.

Semantics mirror the reference's torch norms used inside MLP blocks
(reference: nets/layers.py:59-77): InstanceNorm1d(eps=1e-3, affine=False) and
BatchNorm1d(eps=1e-3, affine=True, track_running_stats=True).

TPU notes: InstanceNorm needs no cross-replica sync, which is why the eval
configs (reference eval/eval_imp.py:268) use norm_fn='in'; we default to it for
training too. BatchNorm supports an optional `axis_name` so batch statistics
are psum-synced across a data mesh (the SyncBatchNorm equivalent of
reference train.py:81).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

EPS = 1e-3  # matches torch eps=1e-3 in reference nets/layers.py:68-70


def instance_norm(x: jax.Array, mask: jax.Array | None = None) -> jax.Array:
    """InstanceNorm over the token axis N of [B, N, C], per (batch, channel).

    When `mask` [B, N] is given, statistics are computed over valid tokens only,
    which is exactly equivalent to running the reference on the compacted
    (unpadded) token set.
    """
    if mask is None:
        mean = jnp.mean(x, axis=1, keepdims=True)
        var = jnp.mean((x - mean) ** 2, axis=1, keepdims=True)
    else:
        m = mask[:, :, None].astype(x.dtype)
        count = jnp.maximum(jnp.sum(m, axis=1, keepdims=True), 1.0)
        mean = jnp.sum(x * m, axis=1, keepdims=True) / count
        var = jnp.sum(((x - mean) ** 2) * m, axis=1, keepdims=True) / count
    return (x - mean) * jax.lax.rsqrt(var + EPS)


def batch_norm_train(
    x: jax.Array,
    scale: jax.Array,
    bias: jax.Array,
    mask: jax.Array | None = None,
    axis_name: str | None = None,
):
    """BatchNorm over (B, N) per channel of [B, N, C]; returns (y, batch_mean, batch_var).

    With `axis_name`, the moments are averaged across the named mesh axis —
    the jax-native SyncBatchNorm (reference train.py:81 uses
    torch SyncBatchNorm over NCCL).
    """
    if mask is None:
        mean = jnp.mean(x, axis=(0, 1))
        sq = jnp.mean(x * x, axis=(0, 1))
    else:
        m = mask[:, :, None].astype(x.dtype)
        count = jnp.maximum(jnp.sum(m), 1.0)
        mean = jnp.sum(x * m, axis=(0, 1)) / count
        sq = jnp.sum(x * x * m, axis=(0, 1)) / count
    if axis_name is not None:
        mean = jax.lax.pmean(mean, axis_name)
        sq = jax.lax.pmean(sq, axis_name)
    var = sq - mean * mean
    y = (x - mean) * jax.lax.rsqrt(var + EPS) * scale + bias
    return y, mean, var


def batch_norm_eval(
    x: jax.Array,
    scale: jax.Array,
    bias: jax.Array,
    running_mean: jax.Array,
    running_var: jax.Array,
) -> jax.Array:
    return (x - running_mean) * jax.lax.rsqrt(running_var + EPS) * scale + bias
