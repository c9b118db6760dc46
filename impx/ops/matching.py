"""Mutual-nearest-neighbor match extraction from an assignment matrix.

Mirrors reference nets/gm.py:305-320 `GM.compute_matches`: row/col argmax over
the non-dustbin block, mutual consistency, score threshold `p`, -1 for
unmatched. Fixed-shape + masked for TPU (invalid rows/cols never match).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def compute_matches(
    scores: jax.Array,
    p: float = 0.2,
    valid0: jax.Array | None = None,
    valid1: jax.Array | None = None,
):
    """scores: [B, N+1, M+1] transport plan. Returns (indices0 [B,N] int32,
    indices1 [B,M] int32, mscores0 [B,N], mscores1 [B,M])."""
    inner = scores[:, :-1, :-1]
    if valid0 is not None:
        inner = jnp.where(valid0[:, :, None], inner, -1.0)
    if valid1 is not None:
        inner = jnp.where(valid1[:, None, :], inner, -1.0)

    max0 = jnp.max(inner, axis=2)
    indices0 = jnp.argmax(inner, axis=2).astype(jnp.int32)
    indices1 = jnp.argmax(inner, axis=1).astype(jnp.int32)
    return matches_from_stats(max0, indices0, indices1, p, valid0, valid1)


def matches_from_stats(
    max0: jax.Array,
    indices0: jax.Array,
    indices1: jax.Array,
    p: float = 0.2,
    valid0: jax.Array | None = None,
    valid1: jax.Array | None = None,
):
    """Mutual-consistency + threshold tail of compute_matches, from row/col
    argmax stats (max0/indices0 [B,N], indices1 [B,M]) — shared with the fused
    Sinkhorn kernel (impx/ops/pallas/sinkhorn.py) which emits these stats
    without materializing the plan."""
    b, n = indices0.shape
    m = indices1.shape[1]
    ar0 = jnp.arange(n, dtype=jnp.int32)[None]
    ar1 = jnp.arange(m, dtype=jnp.int32)[None]
    mutual0 = ar0 == jnp.take_along_axis(indices1, indices0, axis=1)
    mutual1 = ar1 == jnp.take_along_axis(indices0, indices1, axis=1)

    zero = jnp.zeros((), max0.dtype)
    mscores0 = jnp.where(mutual0, max0, zero)
    mscores1 = jnp.where(mutual1, jnp.take_along_axis(mscores0, indices1, axis=1), zero)

    valid_m0 = mutual0 & (mscores0 > p)
    if valid0 is not None:
        valid_m0 = valid_m0 & valid0
    valid_m1 = mutual1 & jnp.take_along_axis(valid_m0, indices1, axis=1)
    if valid1 is not None:
        valid_m1 = valid_m1 & valid1

    indices0 = jnp.where(valid_m0, indices0, -1)
    indices1 = jnp.where(valid_m1, indices1, -1)
    return indices0, indices1, mscores0, mscores1
