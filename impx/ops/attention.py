"""Multi-head attention in [B, N, D] layout with key-validity masking.

Mirrors reference nets/layers.py:100-136 (`MultiHeadedAttention`) and the
shared-probability value path of `SharedAttentionalPropagation`
(nets/layers.py:182-218): q/k/v/merge are 1x1 convs (= dense over channels),
scores are scaled by sqrt(head_dim), and the attention probabilities are
returned so later layers can reuse them (IMP attention sharing) and so EIMP
can pool keypoints by attention mass.

TPU-first: everything is a fixed-shape einsum -> MXU; variable keypoint
counts are expressed with a boolean key mask (large-negative fill before
softmax, the same trick as the reference's masked_fill at layers.py:124-127).
A fused Pallas kernel for the N=2048 hot path lives in impx/ops/pallas/.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from impx.ops.mlp import dense_apply, dense_init

NEG_INF = jnp.finfo(jnp.float32).max  # used as -NEG_INF fill, matching torch masked_fill


def attn_init(key: jax.Array, d_model: int, dtype=jnp.float32) -> dict:
    """q/k/v/merge projections. Reference deep-copies `merge` into q/k/v at init
    (nets/layers.py:106-107) so all four start identical; we keep them i.i.d.
    (equivalent in distribution; the converter handles trained weights)."""
    kq, kk, kv, km = jax.random.split(key, 4)
    return {
        "q": dense_init(kq, d_model, d_model, dtype),
        "k": dense_init(kk, d_model, d_model, dtype),
        "v": dense_init(kv, d_model, d_model, dtype),
        "merge": dense_init(km, d_model, d_model, dtype),
    }


def _split_heads(x: jax.Array, num_heads: int) -> jax.Array:
    """[B, N, D] -> [B, N, head_dim, H]. NOTE head-minor channel order: torch
    views the conv output [B, D, N] as [B, head_dim, H, N] (layers.py:119), so
    channel c = d * H + h; we must split identically for weight parity."""
    b, n, d = x.shape
    return x.reshape(b, n, d // num_heads, num_heads)


def multi_head_attention(
    params: dict,
    x: jax.Array,
    source: jax.Array,
    *,
    num_heads: int = 4,
    key_mask: jax.Array | None = None,
    compute_dtype=None,
):
    """Full attention: project q from x, k/v from source; return (out, prob).

    prob has shape [B, H, Nq, Nk] (same convention as reference `self.prob`,
    layers.py:132) so it can be re-used by `attention_from_prob` and by the
    EIMP pooling statistics.

    key_mask: [B, Nk] bool — invalid keys get zero probability (exact
    equivalence with running attention on the compacted key set).
    """
    q = _split_heads(dense_apply(params["q"], x), num_heads)
    k = _split_heads(dense_apply(params["k"], source), num_heads)
    v = _split_heads(dense_apply(params["v"], source), num_heads)
    if compute_dtype is not None:
        q, k, v = q.astype(compute_dtype), k.astype(compute_dtype), v.astype(compute_dtype)

    head_dim = q.shape[-2]
    scores = jnp.einsum("bndh,bmdh->bhnm", q, k) / (head_dim ** 0.5)
    if key_mask is not None:
        scores = jnp.where(key_mask[:, None, None, :], scores, -NEG_INF)
    prob = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)

    out = jnp.einsum("bhnm,bmdh->bndh", prob.astype(v.dtype), v)
    b, n = out.shape[:2]
    out = dense_apply(params["merge"], out.reshape(b, n, -1).astype(x.dtype))
    return out, prob


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _to_bhnd(x: jax.Array, num_heads: int) -> jax.Array:
    """[B,N,D] -> [B,H,N,dh] keeping the head-minor channel order."""
    return _split_heads(x, num_heads).transpose(0, 3, 1, 2)


def _from_bhnd(x: jax.Array) -> jax.Array:
    """[B,H,N,dh] -> [B,N,D] (head-minor merge: channel c = d*H + h)."""
    b, h, n, dh = x.shape
    return x.transpose(0, 2, 3, 1).reshape(b, n, dh * h)


def multi_head_attention_fused(
    params: dict,
    x: jax.Array,
    source: jax.Array,
    *,
    num_heads: int = 4,
    key_mask: jax.Array | None = None,
    compute_dtype=None,
):
    """Same math as `multi_head_attention` through the fused Pallas kernel —
    probabilities never touch HBM. Returns (out, qk_state) where qk_state
    {'q','k'} ([B,H,N,dh]) replaces the prob tensor for attention sharing:
    a shared layer recomputes softmax(q k^T) in-kernel from the stored
    projections (21 us of MXU) instead of reloading a 268 MB prob (327 us of
    HBM) — identical values."""
    from impx.ops.pallas.attention import mha_fused

    q = _to_bhnd(dense_apply(params["q"], x), num_heads)
    k = _to_bhnd(dense_apply(params["k"], source), num_heads)
    v = _to_bhnd(dense_apply(params["v"], source), num_heads)
    if compute_dtype is not None:
        q, k, v = (t.astype(compute_dtype) for t in (q, k, v))
    out = mha_fused(q, k, v, key_mask, interpret=_interpret())
    out = dense_apply(params["merge"], _from_bhnd(out).astype(x.dtype))
    return out, {"q": q, "k": k}


def attention_from_qk(
    params: dict,
    source: jax.Array,
    qk_state: dict,
    *,
    num_heads: int = 4,
    key_mask: jax.Array | None = None,
    compute_dtype=None,
):
    """Shared-attention value path on the fused kernel: reuse the stored q/k
    projections, project only V (reference layers.py:211-216 semantics)."""
    from impx.ops.pallas.attention import mha_fused

    v = _to_bhnd(dense_apply(params["proj"], source), num_heads)
    if compute_dtype is not None:
        v = v.astype(compute_dtype)
    out = mha_fused(qk_state["q"], qk_state["k"], v, key_mask, interpret=_interpret())
    return dense_apply(params["merge"], _from_bhnd(out).astype(source.dtype))


def attention_from_prob(
    params: dict,
    source: jax.Array,
    prob: jax.Array,
    *,
    num_heads: int = 4,
):
    """Shared-attention value path: reuse `prob`, only project V and merge.

    Mirrors SharedAttentionalPropagation's sharing branch
    (reference nets/layers.py:211-216): value = proj(source); message =
    einsum(prob, value); merge(message).
    """
    v = _split_heads(dense_apply(params["proj"], source), num_heads)
    out = jnp.einsum("bhnm,bmdh->bndh", prob.astype(v.dtype), v)
    b, n = out.shape[:2]
    return dense_apply(params["merge"], out.reshape(b, n, -1))
