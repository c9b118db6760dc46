"""Optimal-transport score heads: Sinkhorn (with learned dustbin) and dual-softmax.

`sink_algorithm` reproduces the reference's non-log Sinkhorn exactly
(reference nets/layers.py:27-46: initial row softmax, then u/v marginal
iterations with eps=1e-8, dustbin marginal = N+1), generalized to fixed-shape
padded inputs with validity masks: padded rows/cols get zero marginals and
-inf scores, which makes the padded iteration *identical* (not approximately)
to running the reference on the compacted keypoint sets. That is the core
trick that lets the whole matcher run with static shapes on TPU.

`log_optimal_transport` is the numerically stable log-domain variant
(reference nets/superglue.py:180-209), exposed for the SuperGlue baseline and
as the preferred head for bf16 training.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

EPS = 1e-8  # reference nets/layers.py:13
_NEG = -1e30


def _pad_with_dustbin(dist: jax.Array, dustbin: jax.Array) -> jax.Array:
    """Append dustbin column and row filled with the learned bin score."""
    b, n, m = dist.shape
    bin_ = jnp.broadcast_to(dustbin.astype(dist.dtype), (b, n, 1))
    dist = jnp.concatenate([dist, bin_], axis=-1)
    bin_row = jnp.broadcast_to(dustbin.astype(dist.dtype), (b, 1, m + 1))
    return jnp.concatenate([dist, bin_row], axis=-2)


def _padded_masks(b, n, m, valid0, valid1, dtype):
    if valid0 is None:
        valid0 = jnp.ones((b, n), bool)
    if valid1 is None:
        valid1 = jnp.ones((b, m), bool)
    one = jnp.ones((b, 1), bool)
    v0p = jnp.concatenate([valid0, one], axis=1)  # dustbin row always valid
    v1p = jnp.concatenate([valid1, one], axis=1)
    return valid0.astype(dtype), valid1.astype(dtype), v0p, v1p


def sink_algorithm(
    dist: jax.Array,
    dustbin: jax.Array,
    iterations: int,
    valid0: jax.Array | None = None,
    valid1: jax.Array | None = None,
    plan_dtype=None,
) -> jax.Array:
    """Non-log Sinkhorn with dustbin, masked. Returns [B, N+1, M+1] transport plan.

    Marginals: each valid keypoint 1, dustbin = (#valid on the other side) + 1
    (reference layers.py:41-44 uses the padded size). Padded entries get zero
    mass exactly.

    plan_dtype: storage dtype of the (fixed) initial plan inside the u/v
    iteration — the loop is HBM-bound on re-reading it, so bf16 halves the
    Sinkhorn cost; u/v stay fp32 and the returned plan is fp32.
    """
    b, n, m = dist.shape
    f0, f1, v0p, v1p = _padded_masks(b, n, m, valid0, valid1, dist.dtype)
    n0 = jnp.sum(f0, axis=1, keepdims=True)  # [B,1] actual counts
    n1 = jnp.sum(f1, axis=1, keepdims=True)

    M = _pad_with_dustbin(dist, dustbin)
    M = jnp.where(v0p[:, :, None] & v1p[:, None, :], M, _NEG)

    # dustbin marginals: reference layers.py:41-44 uses the padded ROW count
    # for the dustbin row and the padded COL count for the dustbin col
    r = jnp.concatenate([f0, n0 + 1.0], axis=1)  # [B, N+1]
    c = jnp.concatenate([f1, n1 + 1.0], axis=1)  # [B, M+1]

    p = jax.nn.softmax(M, axis=-1)
    p_loop = p.astype(plan_dtype) if plan_dtype is not None else p

    def body(_, uv):
        u, v = uv
        u = r / (jnp.einsum("bnm,bm->bn", p_loop, v.astype(p_loop.dtype),
                            preferred_element_type=jnp.float32) + EPS)
        v = c / (jnp.einsum("bnm,bn->bm", p_loop, u.astype(p_loop.dtype),
                            preferred_element_type=jnp.float32) + EPS)
        return u, v

    u0 = jnp.ones_like(r)
    v0 = jnp.ones_like(c)
    u, v = jax.lax.fori_loop(0, iterations, body, (u0, v0))
    return p * u[:, :, None] * v[:, None, :]


def dual_softmax(
    dist: jax.Array,
    dustbin: jax.Array,
    valid0: jax.Array | None = None,
    valid1: jax.Array | None = None,
) -> jax.Array:
    """exp(log_softmax(rows) + log_softmax(cols)) on the dustbin-padded matrix
    (reference nets/layers.py:20-24), masked."""
    b, n, m = dist.shape
    _, _, v0p, v1p = _padded_masks(b, n, m, valid0, valid1, dist.dtype)
    ok = v0p[:, :, None] & v1p[:, None, :]
    M = _pad_with_dustbin(dist, dustbin)
    M = jnp.where(ok, M, _NEG)
    score = jax.nn.log_softmax(M, axis=-1) + jax.nn.log_softmax(M, axis=-2)
    # fully-masked rows x cols softmax to uniform garbage at pad-pad cells;
    # zero them so padded entries carry exactly no mass
    return jnp.where(ok, jnp.exp(score), 0.0)


def log_optimal_transport(
    dist: jax.Array,
    dustbin: jax.Array,
    iterations: int,
    valid0: jax.Array | None = None,
    valid1: jax.Array | None = None,
) -> jax.Array:
    """Log-domain Sinkhorn (reference nets/superglue.py:189-209), masked.

    Returns log-assignment [B, N+1, M+1] with the same normalization as the
    reference: scores are shifted by -log(N+M) ("norm") and the result is the
    log transport plan Z + u + v - norm... exactly as superglue returns
    (Z = Z - norm at the end).
    """
    b, n, m = dist.shape
    f0, f1, v0p, v1p = _padded_masks(b, n, m, valid0, valid1, dist.dtype)
    n0 = jnp.sum(f0, axis=1, keepdims=True)
    n1 = jnp.sum(f1, axis=1, keepdims=True)

    Z = _pad_with_dustbin(dist, dustbin)
    Z = jnp.where(v0p[:, :, None] & v1p[:, None, :], Z, _NEG)

    norm = -jnp.log(n0 + n1)  # [B,1]
    log_mu = jnp.concatenate([norm * f0 + _NEG * (1 - f0), jnp.log(n1) + norm], axis=1)
    log_nu = jnp.concatenate([norm * f1 + _NEG * (1 - f1), jnp.log(n0) + norm], axis=1)

    def body(_, uv):
        u, v = uv
        u = log_mu - jax.nn.logsumexp(Z + v[:, None, :], axis=2)
        v = log_nu - jax.nn.logsumexp(Z + u[:, :, None], axis=1)
        return u, v

    u0 = jnp.zeros_like(log_mu)
    v0 = jnp.zeros_like(log_nu)
    u, v = jax.lax.fori_loop(0, iterations, body, (u0, v0))
    Z = Z + u[:, :, None] + v[:, None, :]
    return Z - norm[:, :, None]
