"""Fused multi-head attention kernel (Pallas/TPU).

Why: the matcher's profile is HBM-bound on attention probabilities — the XLA
path materializes [B,H,N,N] fp32 prob tensors (268 MB at B=4,H=4,N=2048) for
every one of the 60 layer applications, ~48 GB of HBM traffic per batch. This
kernel keeps scores/probs in VMEM: for each (batch, head, query-block) it
computes scores against the *entire* key set (K/V fully VMEM-resident — at
N<=2048, dh=64 a full K block is 512 KB), softmaxes in fp32 and immediately
contracts with V. No flash-style online softmax is needed at these sizes.

Masking: key validity as a [B, N] float mask (1 valid / 0 pad), applied as a
-inf fill before softmax — identical to the XLA path (impx/ops/attention.py).

Used by both inference (produce_matches / iterative) and training: a custom
VJP (flash-style backward that recomputes probs blockwise, defined below at
`_mha_fwd`/`_mha_bwd`) makes the kernel differentiable, and
`DGNNS.forward_train` routes training through it when attn_impl="pallas".
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30

# Scoped-VMEM budget for the [block_q, Nk]-shaped kernel temporaries (scores,
# probs, d-probs). Mosaic's per-kernel stack limit is 16 MB; leaving ~6 MB for
# the q/k/v/o blocks and double buffering keeps every schedule inside it.
_VMEM_TEMP_BUDGET = 10 * 2**20


def _cap_block_q(nq: int, nk: int, requested: int, temp_bytes_per_elem: int) -> int:
    """Largest q-block <= `requested` that (a) divides nq and (b) keeps the
    [block_q, Nk] temporaries under the scoped-VMEM budget. Without this the
    backward kernel OOMs the 16 MB Mosaic stack at fp32/block_q=1024/Nk=1024
    (measured: 16.35 MB) — the 'one tuned sweet spot' failure mode."""
    bq = min(requested, nq)
    while nq % bq:
        bq //= 2
    while bq > 128 and bq * nk * temp_bytes_per_elem > _VMEM_TEMP_BUDGET:
        bq //= 2
    return max(bq, 8)


def _attn_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, *, scale: float):
    q = q_ref[0, 0]  # [bq, dh]
    k = k_ref[0, 0]  # [Nk, dh]
    v = v_ref[0, 0]  # [Nk, dh]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # [bq, Nk]
    mask = mask_ref[0, 0]  # [Nk]
    s = jnp.where(mask[None, :] > 0, s, NEG)
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    # normalize AFTER the PV contraction: divides [bq, dh] instead of
    # [bq, Nk] — one fewer full-width VPU pass (softmax is the kernel's
    # bottleneck at these shapes)
    l = jnp.sum(e, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        e.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0, 0] = (o / l).astype(o_ref.dtype)


def _mha_fwd_call(q, k, v, key_mask3, block_q: int, interpret: bool):
    b, h, nq, dh = q.shape
    nk = k.shape[2]
    scale = 1.0 / (dh ** 0.5)
    grid = (b, h, nq // block_q)
    return pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, block_q, dh), lambda bi, hi, qi: (bi, hi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, nk, dh), lambda bi, hi, qi: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, nk, dh), lambda bi, hi, qi: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, nk), lambda bi, hi, qi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, block_q, dh), lambda bi, hi, qi: (bi, hi, qi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, nq, dh), q.dtype),
        interpret=interpret,
    )(q, k, v, key_mask3)


def _attn_bwd_kernel(q_ref, k_ref, v_ref, mask_ref, do_ref,
                     dq_ref, dk_ref, dv_ref, *, scale: float):
    """Flash-style backward: recompute p from (q, k), then
    dv = p^T do; ds = p*(dp - rowsum(dp*p))*scale; dq = ds k; dk = ds^T q.
    dk/dv accumulate across the (sequential) q-block grid dimension."""
    qi = pl.program_id(2)
    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    do = do_ref[0, 0].astype(jnp.float32)

    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    mask = mask_ref[0, 0]
    s = jnp.where(mask[None, :] > 0, s, NEG)
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)  # [bq, Nk] fp32

    dp = jax.lax.dot_general(do, v.astype(jnp.float32), (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)  # [bq, Nk]
    delta = jnp.sum(dp * p, axis=-1, keepdims=True)
    ds = p * (dp - delta) * scale  # [bq, Nk]

    dq = jax.lax.dot_general(ds, k.astype(jnp.float32), (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dq_ref[0, 0] = dq.astype(dq_ref.dtype)

    @pl.when(qi == 0)
    def _():
        dk_ref[0, 0] = jnp.zeros_like(dk_ref[0, 0])
        dv_ref[0, 0] = jnp.zeros_like(dv_ref[0, 0])

    dv_ref[0, 0] += jax.lax.dot_general(
        p, do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dv_ref.dtype)
    dk_ref[0, 0] += jax.lax.dot_general(
        ds, q.astype(jnp.float32), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dk_ref.dtype)


def _mha_bwd_call(q, k, v, key_mask3, do, block_q: int, interpret: bool):
    b, h, nq, dh = q.shape
    nk = k.shape[2]
    scale = 1.0 / (dh ** 0.5)
    block_q = _cap_block_q(nq, nk, block_q, 16)  # s,e,dp,ds fp32 temps
    grid = (b, h, nq // block_q)
    # With a single q-block per (batch, head) — the training default — dk/dv
    # see exactly one store, so writing the grads in the stream dtype is
    # bit-identical to the fp32-store-then-cast below while saving one full
    # HBM round-trip over three [B,H,N,dh] tensors. Multi-block grids keep
    # fp32 outputs: they accumulate across q-blocks.
    acc_dtypes = ((q.dtype, k.dtype, v.dtype) if nq == block_q
                  else (jnp.float32,) * 3)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_attn_bwd_kernel, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, block_q, dh), lambda bi, hi, qi: (bi, hi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, nk, dh), lambda bi, hi, qi: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, nk, dh), lambda bi, hi, qi: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, nk), lambda bi, hi, qi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_q, dh), lambda bi, hi, qi: (bi, hi, qi, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, block_q, dh), lambda bi, hi, qi: (bi, hi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, nk, dh), lambda bi, hi, qi: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, nk, dh), lambda bi, hi, qi: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, nq, dh), acc_dtypes[0]),
            jax.ShapeDtypeStruct((b, h, nk, dh), acc_dtypes[1]),
            jax.ShapeDtypeStruct((b, h, nk, dh), acc_dtypes[2]),
        ],
        interpret=interpret,
    )(q, k, v, key_mask3, do)
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _mha(q, k, v, key_mask3, block_q, interpret):
    return _mha_fwd_call(q, k, v, key_mask3, block_q, interpret)


def _mha_fwd(q, k, v, key_mask3, block_q, interpret):
    out = _mha_fwd_call(q, k, v, key_mask3, block_q, interpret)
    return out, (q, k, v, key_mask3)


def _mha_bwd(block_q, interpret, res, do):
    q, k, v, key_mask3 = res
    dq, dk, dv = _mha_bwd_call(q, k, v, key_mask3, do, block_q, interpret)
    return dq, dk, dv, jnp.zeros_like(key_mask3)


_mha.defvjp(_mha_fwd, _mha_bwd)


@functools.partial(jax.jit, static_argnames=("block_q", "interpret"))
def mha_fused(q, k, v, key_mask=None, block_q: int = 256, interpret: bool = False):
    """q [B,H,Nq,dh], k/v [B,H,Nk,dh], key_mask [B,Nk] (bool/float) -> [B,H,Nq,dh].

    fp32 softmax; matmuls accumulate fp32 with inputs in q/k/v's dtype
    (pass bf16 inputs for MXU-native throughput). Differentiable: a custom
    VJP runs the flash-style backward kernel (recompute-from-qk; dk/dv
    accumulated across the sequential q-block grid).
    """
    b, h, nq, dh = q.shape
    nk = k.shape[2]
    block_q = _cap_block_q(nq, nk, block_q, 8)  # s,e fp32 temps
    if key_mask is None:
        key_mask3 = jnp.ones((b, 1, nk), jnp.float32)
    else:
        key_mask3 = key_mask.astype(jnp.float32).reshape(b, 1, nk)
    return _mha(q, k, v, key_mask3, block_q, interpret)


def _attn_kernel_lse(q_ref, k_ref, v_ref, mask_ref, o_ref, lse_ref, *,
                     scale: float):
    """Forward attention that additionally emits the row log-sum-exp — the
    residual the lse-based backward kernel needs to rebuild softmax
    probabilities in a single exp pass (instead of max+exp+sum+div)."""
    q = q_ref[0, 0]  # [bq, dh]
    k = k_ref[0, 0]  # [Nk, dh]
    v = v_ref[0, 0]  # [Nk, dh]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    mask = mask_ref[0, 0]
    s = jnp.where(mask[None, :] > 0, s, NEG)
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    l = jnp.sum(e, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        e.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0, 0] = (o / l).astype(o_ref.dtype)
    lse_ref[0, 0] = m + jnp.log(l)  # [bq, 1]


def mha_fused_lse(q, k, v, key_mask=None, block_q: int = 256,
                  interpret: bool = False):
    """Like `mha_fused` but returns (out, lse) with lse [B,H,Nq,1] fp32.

    NOT differentiable by itself — this is the forward half of the fused
    training layer (impx/models/fast.py `_make_fused_layer`), whose custom
    VJP calls `mha_bwd_from_lse` with the saved (out, lse) residuals."""
    b, h, nq, dh = q.shape
    nk = k.shape[2]
    block_q = _cap_block_q(nq, nk, block_q, 8)  # s,e fp32 temps
    if key_mask is None:
        key_mask3 = jnp.ones((b, 1, nk), jnp.float32)
    else:
        key_mask3 = key_mask.astype(jnp.float32).reshape(b, 1, nk)
    scale = 1.0 / (dh ** 0.5)
    grid = (b, h, nq // block_q)
    return pl.pallas_call(
        functools.partial(_attn_kernel_lse, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, block_q, dh), lambda bi, hi, qi: (bi, hi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, nk, dh), lambda bi, hi, qi: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, nk, dh), lambda bi, hi, qi: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, nk), lambda bi, hi, qi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, block_q, dh), lambda bi, hi, qi: (bi, hi, qi, 0),
                         memory_space=pltpu.VMEM),
            # lse carries a trailing singleton: Mosaic requires the last two
            # block dims be (8,128)-divisible or equal to the array dims
            pl.BlockSpec((1, 1, block_q, 1), lambda bi, hi, qi: (bi, hi, qi, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, nq, dh), q.dtype),
            jax.ShapeDtypeStruct((b, h, nq, 1), jnp.float32),
        ],
        interpret=interpret,
    )(q, k, v, key_mask3)


def _attn_bwd_lse_kernel(q_ref, k_ref, v_ref, mask_ref, lse_ref, o_ref,
                         do_ref, dq_ref, dk_ref, dv_ref, *, scale: float):
    """LSE-based flash backward. vs `_attn_bwd_kernel`: (a) probabilities are
    rebuilt with ONE exp pass from the saved row log-sum-exp, (b) the softmax
    Jacobian's row term uses the flash identity rowsum(dp*p) == rowsum(do*o)
    (exact: p@v == o), (c) every matmul runs with inputs in the activation
    stream's dtype (bf16 under bf16 training — fp32 MXU passes are ~4x
    slower), accumulating fp32."""
    qi = pl.program_id(2)
    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    do = do_ref[0, 0]
    o = o_ref[0, 0]
    lse = lse_ref[0, 0]  # [bq, 1]

    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    mask = mask_ref[0, 0]
    s = jnp.where(mask[None, :] > 0, s, NEG)
    p = jnp.exp(s - lse)  # [bq, Nk] fp32
    pb = p.astype(q.dtype)

    delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32),
                    axis=-1, keepdims=True)  # [bq, 1]
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)  # [bq, Nk]
    ds = (p * (dp - delta) * scale).astype(q.dtype)

    dq_ref[0, 0] = jax.lax.dot_general(
        ds, k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dq_ref.dtype)

    @pl.when(qi == 0)
    def _():
        dk_ref[0, 0] = jnp.zeros_like(dk_ref[0, 0])
        dv_ref[0, 0] = jnp.zeros_like(dv_ref[0, 0])

    dv_ref[0, 0] += jax.lax.dot_general(
        pb, do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dv_ref.dtype)
    dk_ref[0, 0] += jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dk_ref.dtype)


def mha_bwd_from_lse(q, k, v, key_mask, lse, o, do, block_q: int = 256,
                     interpret: bool = False):
    """Backward of `mha_fused_lse` given the saved (o, lse) residuals.
    Returns (dq, dk, dv) in q/k/v's dtype."""
    b, h, nq, dh = q.shape
    nk = k.shape[2]
    # temps: s, p, dp fp32 (12 B/elem) + pb, ds in the stream dtype
    stream = 2 * jnp.dtype(q.dtype).itemsize
    block_q = _cap_block_q(nq, nk, block_q, 12 + stream)
    if key_mask is None:
        key_mask3 = jnp.ones((b, 1, nk), jnp.float32)
    else:
        key_mask3 = key_mask.astype(jnp.float32).reshape(b, 1, nk)
    scale = 1.0 / (dh ** 0.5)
    grid = (b, h, nq // block_q)
    do = do.astype(q.dtype)
    o = o.astype(q.dtype)
    # Single q-block grid (the training default): one store per dk/dv, so
    # stream-dtype outputs are bit-identical to fp32-store-then-cast and
    # skip an HBM round-trip over three [B,H,N,dh] fp32 tensors.
    acc_dtypes = ((q.dtype, k.dtype, v.dtype) if nq == block_q
                  else (jnp.float32,) * 3)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_attn_bwd_lse_kernel, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, block_q, dh), lambda bi, hi, qi: (bi, hi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, nk, dh), lambda bi, hi, qi: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, nk, dh), lambda bi, hi, qi: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, nk), lambda bi, hi, qi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_q, 1), lambda bi, hi, qi: (bi, hi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_q, dh), lambda bi, hi, qi: (bi, hi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_q, dh), lambda bi, hi, qi: (bi, hi, qi, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, block_q, dh), lambda bi, hi, qi: (bi, hi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, nk, dh), lambda bi, hi, qi: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, nk, dh), lambda bi, hi, qi: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, nq, dh), acc_dtypes[0]),
            jax.ShapeDtypeStruct((b, h, nk, dh), acc_dtypes[1]),
            jax.ShapeDtypeStruct((b, h, nk, dh), acc_dtypes[2]),
        ],
        interpret=interpret,
    )(q, k, v, key_mask3, lse, o, do)
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


def _mass_kernel(q_ref, k_ref, mask_ref, qmask_ref, mass_ref, *, scale: float):
    """Accumulate per-key attention mass: sum over heads and valid queries of
    softmax(q k^T) — the EIMP pooling statistic (reference adgm.py:424-432)."""
    qi = pl.program_id(2)
    hi = pl.program_id(1)

    q = q_ref[0, 0]
    k = k_ref[0, 0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    mask = mask_ref[0, 0]
    s = jnp.where(mask[None, :] > 0, s, NEG)
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)
    qmask = qmask_ref[0, 0, pl.ds(qi * q.shape[0], q.shape[0])]
    col = jnp.sum(p * qmask[:, None], axis=0)  # [Nk]

    @pl.when((hi == 0) & (qi == 0))
    def _():
        mass_ref[0, 0] = jnp.zeros_like(mass_ref[0, 0])

    mass_ref[0, 0] += col


@functools.partial(jax.jit, static_argnames=("block_q", "interpret"))
def attention_key_mass(q, k, key_mask=None, query_mask=None, block_q: int = 256,
                       interpret: bool = False):
    """Per-key attention mass [B, Nk]: sum over heads + valid queries of the
    softmax probabilities, WITHOUT materializing them in HBM."""
    b, h, nq, dh = q.shape
    nk = k.shape[2]
    block_q = _cap_block_q(nq, nk, block_q, 8)  # s,e/p fp32 temps
    if key_mask is None:
        key_mask = jnp.ones((b, 1, nk), jnp.float32)
    else:
        key_mask = key_mask.astype(jnp.float32).reshape(b, 1, nk)
    if query_mask is None:
        query_mask = jnp.ones((b, 1, nq), jnp.float32)
    else:
        query_mask = query_mask.astype(jnp.float32).reshape(b, 1, nq)
    scale = 1.0 / (dh ** 0.5)

    grid = (b, h, nq // block_q)
    mass = pl.pallas_call(
        functools.partial(_mass_kernel, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, block_q, dh), lambda bi, hi, qi: (bi, hi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, nk, dh), lambda bi, hi, qi: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, nk), lambda bi, hi, qi: (bi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, nq), lambda bi, hi, qi: (bi, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, nk), lambda bi, hi, qi: (bi, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 1, nk), jnp.float32),
        interpret=interpret,
    )(q, k, key_mask, query_mask)
    return mass[:, 0, :]
