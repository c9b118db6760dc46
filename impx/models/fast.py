"""Scan-based fast forward for DGNNS/AdaGMN-style matchers (TPU fast path).

Motivation: (a) compile time — the unrolled 15-iteration forward instantiates
the fused attention kernel at ~60 call sites, and this environment's compile
service does not deduplicate identical Mosaic kernels (each site ~4 min); the
scan body contains exactly TWO kernel call sites (one self, one cross)
regardless of depth. (b) It is the idiomatic XLA structure anyway: one
compiled body, stacked parameters, no 30-layer graph.

Equivalences used (covered by tests/test_pallas_ops.py and
tests/test_fast_train.py):
  * both images processed in one call by stacking them on the batch axis
    (the reference's own training trick, gms.py:91-105): self-attention
    source = the stack itself; cross-attention source = halves swapped;
  * heterogeneous layers (full attention vs shared) are padded to one
    structure; shared layers carry dummy q/k weights and a `shared` flag
    selects the carried q/k projections instead — identical values to the
    reference's prob reuse, since softmax(qk^T) is recomputed in-kernel from
    the very same projections;
  * per-iteration final projections / Sinkhorn run inside the scan body only
    when per-iteration outputs are requested (EIMP), else once after the scan.

Constraints: norm_fn='in' (no per-layer batch-norm state; this is the
published eval config). Training uses forward_train_scan (the fused kernel
has a custom VJP; the scan body is rematerialized).
"""
from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name

from impx.models.config import MatcherConfig
from impx.ops.attention import _interpret
from impx.ops.norms import instance_norm


def _full_layer(layer: dict) -> dict:
    """Pad a layer's params to the homogeneous scan structure."""
    if "attn" in layer:
        a = layer["attn"]
        q, k, v, merge = a["q"], a["k"], a["v"], a["merge"]
        shared = jnp.asarray(0.0)
    else:
        v, merge = layer["proj"], layer["merge"]
        q = jax.tree.map(jnp.zeros_like, v)
        k = jax.tree.map(jnp.zeros_like, v)
        shared = jnp.asarray(1.0)
    mlp = layer["mlp"]
    return {
        "q": q, "k": k, "v": v, "merge": merge,
        "mlp0": {"w": mlp[0]["w"], "b": mlp[0]["b"]},
        "mlp1": {"w": mlp[1]["w"], "b": mlp[1]["b"]},
        "shared": shared,
    }


def stack_params(params: dict, config: MatcherConfig) -> dict:
    """Stack the per-layer pytrees: self layers (even indices) and cross layers
    (odd) each become one pytree with a leading n_layers axis; final
    projections likewise."""
    gnn = params["gnn"]
    self_layers = [_full_layer(gnn[2 * i]) for i in range(config.n_layers)]
    cross_layers = [_full_layer(gnn[2 * i + 1]) for i in range(config.n_layers)]
    stack = lambda layers: jax.tree.map(lambda *xs: jnp.stack(xs), *layers)
    return {
        "self": stack(self_layers),
        "cross": stack(cross_layers),
        "final_w": jnp.stack([p["w"] for p in params["final_proj"]]),
        "final_b": jnp.stack([p["b"] for p in params["final_proj"]]),
        "kenc": params["kenc"],
        "bin_score": params["bin_score"],
    }


def _proj_heads(p, x, num_heads):
    """Dense projection straight into [B,H,N,dh] (head-minor channel order
    c = d*H + h, matching impx/ops/attention._split_heads) — one einsum, no
    transpose passes over HBM."""
    cin, cout = p["w"].shape
    dh = cout // num_heads
    w = p["w"].reshape(cin, dh, num_heads)
    b = p["b"].reshape(dh, num_heads)
    y = jnp.einsum("bnc,cdh->bhnd", x, w.astype(x.dtype))
    return y + b.T[None, :, None, :].astype(y.dtype)


def _merge_heads(p, x):
    """[B,H,N,dh] -> dense merge -> [B,N,D], again transpose-free."""
    cin, cout = p["w"].shape
    bsz, h, n, dh = x.shape
    w = p["w"].reshape(dh, h, cout)  # input channel c = d*H + h
    return jnp.einsum("bhnd,dho->bno", x, w.astype(x.dtype)) + p["b"].astype(x.dtype)


def _tail(L, x, out, query_mask, ac_fn):
    """Post-attention tail of an attentional-propagation layer: head merge,
    concat-MLP with fp32 masked InstanceNorm, activation. Shared verbatim by
    the autodiff path (_attn_block) and the custom-VJP fused layer (both
    directions of _make_fused_layer), so the two paths can never diverge."""
    message = _merge_heads(L["merge"], out.astype(x.dtype))

    y = jnp.concatenate([x, message], axis=-1)
    h = jnp.einsum("bnc,cd->bnd", y, L["mlp0"]["w"].astype(y.dtype)) + \
        L["mlp0"]["b"].astype(y.dtype)
    h = instance_norm(h.astype(jnp.float32), mask=query_mask).astype(y.dtype)
    if ac_fn == "relu":
        h = jax.nn.relu(h)
    elif ac_fn == "gelu":
        h = jax.nn.gelu(h, approximate=False)
    else:
        h = jax.nn.leaky_relu(h, negative_slope=0.1)
    return jnp.einsum("bnc,cd->bnd", h, L["mlp1"]["w"].astype(h.dtype)) + \
        L["mlp1"]["b"].astype(h.dtype)


def _attn_block(L, x, source, qk_carry, key_mask, query_mask, num_heads, ac_fn,
                compute_dtype, interpret, block_q=None, shared_static=None):
    """One attentional-propagation layer on the stacked batch. Returns
    (delta, new_qk_carry). The activation stream runs in `compute_dtype`
    (bf16 halves HBM traffic and keeps all matmuls MXU-native); instance-norm
    statistics stay fp32.

    `shared_static`: when the caller knows AT TRACE TIME whether this layer
    shares attention (e.g. the staged loop, where layer indices are Python
    ints), pass True/False to skip either the q/k projections (shared) or the
    runtime select (fresh). None = runtime `L["shared"]` select (the scan
    path, where all layers run through one traced body)."""
    from impx.ops.pallas.attention import mha_fused

    v = _proj_heads(L["v"], source, num_heads)
    if shared_static is None:
        q_new = _proj_heads(L["q"], x, num_heads)
        k_new = _proj_heads(L["k"], source, num_heads)
        shared = L["shared"] > 0.5
        q_used = jnp.where(shared, qk_carry["q"], q_new)
        k_used = jnp.where(shared, qk_carry["k"], k_new)
    elif shared_static:
        q_used, k_used = qk_carry["q"], qk_carry["k"]
    else:
        q_used = _proj_heads(L["q"], x, num_heads)
        k_used = _proj_heads(L["k"], source, num_heads)

    out = mha_fused(q_used, k_used, v, key_mask, interpret=interpret,
                    block_q=block_q or 256)
    # name the kernel output so the 'attn'/'attn_head' remat policies can
    # save it: the backward then reuses the stored value instead of re-running
    # the fused kernel (the priciest VPU work in the body); a no-op outside
    # remat and under the other policies
    out = checkpoint_name(out, "attn_out")
    delta = _tail(L, x, out, query_mask, ac_fn)
    return delta, {"q": q_used, "k": k_used}


def _swap_half(x):
    """Swap the two image halves of the stacked batch [2B, ...]."""
    b = x.shape[0] // 2
    return jnp.concatenate([x[b:], x[:b]], axis=0)


@functools.lru_cache(maxsize=None)
def _make_fused_layer(is_self: bool, num_heads: int, ac_fn: str,
                      block_q: int, interpret: bool):
    """Whole attentional-propagation layer as ONE custom-VJP op (the training
    fast path, cfg.train_fused).

    Why: under jax.checkpoint the backward pass replays the entire scan body
    and runs the attention backward kernel with fp32 matmul inputs — measured
    step MFU 19% (STATUS.md round-4 roofline). This op instead defines its own
    residuals — (x, q_used, k_used, attention out, row log-sum-exp) — so the
    backward (a) never replays the forward, (b) rebuilds softmax probabilities
    in one exp pass from the saved lse, and (c) runs every backward matmul
    with activation-stream-dtype inputs (bf16 under bf16 training). The
    projection/merge/MLP backward reuses the EXACT forward code via jax.vjp
    on the shared `head_fn`/`_tail` subfunctions, so only the attention-core
    backward math is hand-written (impx/ops/pallas/attention.py
    `mha_bwd_from_lse`).

    Signature of the returned op:
        layer(x, carry_q, carry_k, L, key_mask_f, in_mask_f)
            -> (new_x, q_used, k_used)
    with x [2B,N,D]; carries [2B,H,N,dh]; masks FLOAT [2B,N] (custom_vjp
    needs float cotangents). For cross layers (is_self=False) the attention
    source is the swapped stack, recomputed from x in the backward.
    Matches the hot loop of reference trainer.py:102-150 / gms.py:48-137.
    """
    from impx.ops.pallas.attention import mha_bwd_from_lse, mha_fused_lse

    def head_fn(x, Lq, Lk, Lv):
        source = x if is_self else _swap_half(x)
        q_new = _proj_heads(Lq, x, num_heads)
        k_new = _proj_heads(Lk, source, num_heads)
        v = _proj_heads(Lv, source, num_heads)
        return q_new, k_new, v

    def fwd_impl(x, cq, ck, L, key_mask, in_mask):
        q_new, k_new, v = head_fn(x, L["q"], L["k"], L["v"])
        shared = L["shared"] > 0.5
        q_used = jnp.where(shared, cq, q_new)
        k_used = jnp.where(shared, ck, k_new)
        o, lse = mha_fused_lse(q_used, k_used, v, key_mask,
                               block_q=block_q, interpret=interpret)
        delta = _tail(L, x, o, in_mask, ac_fn)
        return x + delta, q_used, k_used, o, lse

    @jax.custom_vjp
    def layer(x, cq, ck, L, key_mask, in_mask):
        out_x, q_used, k_used, _, _ = fwd_impl(x, cq, ck, L, key_mask, in_mask)
        return out_x, q_used, k_used

    def layer_fwd(x, cq, ck, L, key_mask, in_mask):
        out_x, q_used, k_used, o, lse = fwd_impl(x, cq, ck, L, key_mask,
                                                 in_mask)
        return (out_x, q_used, k_used), (x, q_used, k_used, o, lse, L,
                                         key_mask, in_mask)

    def layer_bwd(res, cts):
        x, q_used, k_used, o, lse, L, key_mask, in_mask = res
        d_out, d_cq_out, d_ck_out = cts

        # tail backward: exact-forward-code vjp (merge + concat-MLP + IN)
        Lt = {"merge": L["merge"], "mlp0": L["mlp0"], "mlp1": L["mlp1"]}
        tail_closed = lambda Lt_, x_, o_: _tail(Lt_, x_, o_, in_mask, ac_fn)
        _, tail_vjp = jax.vjp(tail_closed, Lt, x, o)
        dLt, dx_tail, do = tail_vjp(d_out)

        # attention-core backward from the saved (o, lse); v recomputed
        # (one einsum) instead of stored
        source = x if is_self else _swap_half(x)
        v = _proj_heads(L["v"], source, num_heads)
        dq_a, dk_a, dv = mha_bwd_from_lse(q_used, k_used, v, key_mask, lse, o,
                                          do, block_q=block_q,
                                          interpret=interpret)

        # q_used/k_used feed both the attention AND the next shared layer
        # (the carry outputs) — sum the two cotangent sources, then route
        # through the select: shared layers propagate to the carry, fresh
        # layers to the projections
        dq_tot = (dq_a + d_cq_out).astype(q_used.dtype)
        dk_tot = (dk_a + d_ck_out).astype(k_used.dtype)
        shared = L["shared"] > 0.5
        zq = jnp.zeros_like(dq_tot)
        dq_new = jnp.where(shared, zq, dq_tot)
        d_cq = jnp.where(shared, dq_tot, zq)
        dk_new = jnp.where(shared, zq, dk_tot)
        d_ck = jnp.where(shared, dk_tot, zq)

        _, head_vjp = jax.vjp(head_fn, x, L["q"], L["k"], L["v"])
        dx_head, dLq, dLk, dLv = head_vjp((dq_new, dk_new, dv))

        dx = (d_out + dx_tail + dx_head).astype(x.dtype)
        dL = {"q": dLq, "k": dLk, "v": dLv, "merge": dLt["merge"],
              "mlp0": dLt["mlp0"], "mlp1": dLt["mlp1"],
              "shared": jnp.zeros_like(L["shared"])}
        return (dx, d_cq, d_ck, dL, jnp.zeros_like(key_mask),
                jnp.zeros_like(in_mask))

    layer.defvjp(layer_fwd, layer_bwd)
    return layer


def final_matches_from_desc(model, stacked, desc, b, valid0, valid1, p,
                            with_scores, interpret):
    """Last-iteration match extraction from the final stacked descriptors
    (the tail of forward_scan, shared with the pipeline-parallel forward):
    final projection -> distance -> fused (log-)Sinkhorn stats or dual
    softmax -> mutual-NN matches."""
    cfg = model.config
    params_like = {"final_proj": [
        {"w": stacked["final_w"][-1], "b": stacked["final_b"][-1]}],
        "bin_score": stacked["bin_score"]}

    desc0, desc1 = desc[:b].astype(jnp.float32), desc[b:].astype(jnp.float32)
    dist = model.compute_distance(params_like, desc0, desc1, layer_id=-1)
    if cfg.log_ot and cfg.with_sinkhorn:
        # log-domain head on the fast path: fused iterated-logsumexp
        # kernel; mscores = exp(log row max), scores = log-plan (the
        # compute_score contract when log_ot is set)
        from impx.ops.matching import matches_from_stats
        from impx.ops.pallas.log_sinkhorn import (
            log_sinkhorn_fused_stats, log_plan_from_uv)

        stats = log_sinkhorn_fused_stats(
            dist, stacked["bin_score"], cfg.sinkhorn_iterations,
            valid0, valid1, interpret=interpret)
        idx0, idx1, ms0, ms1 = matches_from_stats(
            jnp.exp(stats["max0"]), stats["idx0"], stats["idx1"], p,
            valid0, valid1)
        score = (log_plan_from_uv(
            dist, stacked["bin_score"], stats["u"], stats["v"],
            valid0, valid1) if with_scores else None)
    elif cfg.with_sinkhorn:
        from impx.ops.matching import matches_from_stats
        from impx.ops.pallas.sinkhorn import (
            sinkhorn_fused_stats, sinkhorn_plan_from_uv)

        stats = sinkhorn_fused_stats(
            dist, stacked["bin_score"], cfg.sinkhorn_iterations,
            valid0, valid1, interpret=interpret)
        idx0, idx1, ms0, ms1 = matches_from_stats(
            stats["max0"], stats["idx0"], stats["idx1"], p, valid0, valid1)
        score = (sinkhorn_plan_from_uv(
            dist, stacked["bin_score"], stats["u"], stats["v"],
            valid0, valid1) if with_scores else None)
    else:
        score = model.compute_score(params_like, dist, valid0, valid1)
        idx0, idx1, ms0, ms1 = model.compute_matches(
            score, p=p, valid0=valid0, valid1=valid1)
    return {"scores": [score], "indices0": [idx0], "mscores0": [ms0]}


def forward_scan(
    model,
    stacked: dict,
    data: dict[str, Any],
    p: float = 0.2,
    only_last: bool = True,
    with_scores: bool = True,
):
    """DGNNS produce_matches on the scan fast path. data uses the standard
    matcher feed (descriptors0/1 [B,N,D], norm_keypoints0/1, scores0/1,
    valid0/1). Returns the same dict structure as GM.produce_matches.

    with_scores=False skips materializing the [B,N+1,M+1] transport plan in
    HBM entirely (matches come from the fused Sinkhorn kernel's stats); eval
    paths that only consume indices/mscores should pass False."""
    cfg = model.config
    assert cfg.norm_fn == "in", "scan fast path supports norm_fn='in' only"
    interpret = _interpret()
    compute_dtype = model.compute_dtype

    valid0 = data.get("valid0")
    valid1 = data.get("valid1")
    b, n = data["descriptors0"].shape[:2]
    if valid0 is None:
        valid0 = jnp.ones((b, n), bool)
    if valid1 is None:
        valid1 = jnp.ones((b, data["descriptors1"].shape[1]), bool)

    enc0, _ = model.encode_keypoint(
        {"kenc": stacked["kenc"]}, data["norm_keypoints0"], data["scores0"], valid0)
    enc1, _ = model.encode_keypoint(
        {"kenc": stacked["kenc"]}, data["norm_keypoints1"], data["scores1"], valid1)
    desc = jnp.concatenate([data["descriptors0"] + enc0, data["descriptors1"] + enc1], axis=0)
    if compute_dtype is not None:
        desc = desc.astype(compute_dtype)
    mask = jnp.concatenate([valid0, valid1], axis=0)  # [2B, N]
    mask_swap = jnp.concatenate([valid1, valid0], axis=0)

    h = cfg.num_heads
    dh = cfg.descriptor_dim // h
    zero_qk = {
        "q": jnp.zeros((2 * b, h, n, dh),
                       compute_dtype or jnp.float32),
        "k": jnp.zeros((2 * b, h, n, dh),
                       compute_dtype or jnp.float32),
    }

    def swap(x):
        return jnp.concatenate([x[b:], x[:b]], axis=0)

    def body(carry, per_it):
        desc, qk_self, qk_cross = carry
        delta, qk_self = _attn_block(
            per_it["self"], desc, desc, qk_self, mask, mask,
            h, cfg.ac_fn, compute_dtype, interpret,
            block_q=cfg.attn_block_q)
        desc = desc + delta
        delta, qk_cross = _attn_block(
            per_it["cross"], desc, swap(desc), qk_cross, mask_swap, mask,
            h, cfg.ac_fn, compute_dtype, interpret,
            block_q=cfg.attn_block_q)
        desc = desc + delta
        if only_last:
            return (desc, qk_self, qk_cross), None
        return (desc, qk_self, qk_cross), desc

    per_it = {"self": stacked["self"], "cross": stacked["cross"]}
    (desc, _, _), descs = jax.lax.scan(body, (desc, zero_qk, zero_qk), per_it)

    if only_last:
        return final_matches_from_desc(model, stacked, desc, b, valid0, valid1,
                                       p, with_scores, interpret)

    # per-iteration outputs: project each collected iteration (host loop over
    # nI small programs is fine here; this path is for diagnostics/parity)
    out_scores, out_idx0, out_ms0 = [], [], []
    for li in range(cfg.n_layers):
        pl = {"final_proj": [
            {"w": stacked["final_w"][li], "b": stacked["final_b"][li]}],
            "bin_score": stacked["bin_score"]}
        d0 = descs[li][:b].astype(jnp.float32)
        d1 = descs[li][b:].astype(jnp.float32)
        dist = model.compute_distance(pl, d0, d1, layer_id=-1)
        score = model.compute_score(pl, dist, valid0, valid1)
        idx0, _, ms0, _ = model.compute_matches(score, p=p, valid0=valid0, valid1=valid1)
        out_scores.append(score)
        out_idx0.append(idx0)
        out_ms0.append(ms0)
    return {"scores": out_scores, "indices0": out_idx0, "mscores0": out_ms0}


def _remat(fn, mode: str):
    """Wrap `fn` per the train_remat mode (MatcherConfig.train_remat):
    'full' recomputes everything, 'dots' saves MXU outputs, 'attn'/'attn_head'
    save the named fused-attention kernel outputs (skip the priciest VPU
    recompute), 'none' stores everything."""
    if mode == "none":
        return fn
    if mode == "dots":
        return jax.checkpoint(fn, prevent_cse=False,
                              policy=jax.checkpoint_policies.dots_saveable)
    if mode in ("attn", "attn_head"):
        return jax.checkpoint(
            fn, prevent_cse=False,
            policy=jax.checkpoint_policies.save_only_these_names("attn_out"))
    if mode == "attn_dots":
        return jax.checkpoint(
            fn, prevent_cse=False,
            policy=jax.checkpoint_policies.save_from_both_policies(
                jax.checkpoint_policies.dots_saveable,
                jax.checkpoint_policies.save_only_these_names("attn_out")))
    if mode == "full":
        return jax.checkpoint(fn, prevent_cse=False)
    raise ValueError(f"unknown train_remat mode {mode!r} (expected 'none', "
                     "'full', 'dots', 'attn', 'attn_head' or 'attn_dots')")


def forward_train_scan(model, stacked: dict, data: dict[str, Any]):
    """DGNNS training forward on the scan fast path: per-iteration Sinkhorn +
    GraphLoss accumulated in the scan carry (reference gms.py:48-137
    semantics: every cross-layer output supervised against the same GT mask).
    Differentiable end-to-end (the fused kernel has a custom VJP).
    with_geo adds the pose-consistency term per iteration (the `_geo`
    training variants; reference nets/loss.py:20/125-126 hook)."""
    from impx.models.loss import (geo_loss, graph_loss, matching_accuracy,
                                  maybe_epipolar_matrix)

    cfg = model.config
    assert cfg.norm_fn == "in"
    interpret = _interpret()
    compute_dtype = model.compute_dtype

    gt = data["matching_mask"]
    epi = maybe_epipolar_matrix(data, cfg.geo_clamp) if cfg.with_geo else None
    valid0 = data.get("valid0")
    valid1 = data.get("valid1")
    b, n = data["descriptors0"].shape[:2]
    if valid0 is None:
        valid0 = jnp.ones((b, n), bool)
    if valid1 is None:
        valid1 = jnp.ones((b, data["descriptors1"].shape[1]), bool)

    enc0, _ = model.encode_keypoint(
        {"kenc": stacked["kenc"]}, data["norm_keypoints0"], data["scores0"], valid0)
    enc1, _ = model.encode_keypoint(
        {"kenc": stacked["kenc"]}, data["norm_keypoints1"], data["scores1"], valid1)
    desc = jnp.concatenate([data["descriptors0"] + enc0, data["descriptors1"] + enc1], axis=0)
    if compute_dtype is not None:
        desc = desc.astype(compute_dtype)
    mask = jnp.concatenate([valid0, valid1], axis=0)
    mask_swap = jnp.concatenate([valid1, valid0], axis=0)

    h = cfg.num_heads
    dh = cfg.descriptor_dim // h
    zero_qk = {
        "q": jnp.zeros((2 * b, h, n, dh), compute_dtype or jnp.float32),
        "k": jnp.zeros((2 * b, h, n, dh), compute_dtype or jnp.float32),
    }
    m1 = valid1.shape[1]
    zero_score = jnp.zeros((b, n + 1, m1 + 1), jnp.float32)

    def swap(x):
        return jnp.concatenate([x[b:], x[:b]], axis=0)

    # training q-block: a single full-N block (N <= 1024, i.e. the published
    # training config) removes the backward kernel's sequential dk/dv
    # accumulation sweeps — measured 80.4 vs 77.8 train pairs/s at b16
    block_q = cfg.attn_block_q or (n if n <= 1024 else None)

    def attn_part(desc, qk_self, qk_cross, per_it):
        delta, qk_self = _attn_block(per_it["self"], desc, desc, qk_self, mask, mask,
                                     h, cfg.ac_fn, compute_dtype, interpret,
                                     block_q=block_q)
        desc = desc + delta
        delta, qk_cross = _attn_block(per_it["cross"], desc, swap(desc), qk_cross,
                                      mask_swap, mask, h, cfg.ac_fn, compute_dtype,
                                      interpret, block_q=block_q)
        desc = desc + delta
        return desc, qk_self, qk_cross

    def head_part(desc, per_it, terms):
        pl = {"final_proj": [{"w": per_it["final_w"], "b": per_it["final_b"]}],
              "bin_score": stacked["bin_score"]}
        d0, d1 = desc[:b].astype(jnp.float32), desc[b:].astype(jnp.float32)
        dist = model.compute_distance(pl, d0, d1, layer_id=-1)
        score = model.compute_score(pl, dist, valid0, valid1)
        t = graph_loss(score, gt, scores_are_log=model.scores_are_log)
        if epi is not None:
            prob = jnp.exp(score) if model.scores_are_log else score
            t["geo"] = geo_loss(prob, epi, valid0, valid1)
        return jax.tree.map(jnp.add, terms, t), score

    per_it = {"self": stacked["self"], "cross": stacked["cross"],
              "final_w": stacked["final_w"], "final_b": stacked["final_b"]}
    zero_terms = {"corr": jnp.zeros(()), "incorr": jnp.zeros(()), "neg": jnp.zeros(())}
    if epi is not None:
        zero_terms["geo"] = jnp.zeros(())
    if cfg.train_supervision not in ("all", "last"):
        raise ValueError(f"unknown train_supervision "
                         f"{cfg.train_supervision!r} (expected 'all'|'last')")
    # 'last': SuperGlue-style supervision — the score head runs once after
    # the scan instead of inside every iteration (n_layers fewer
    # dist+Sinkhorn+loss chains per step, forward AND backward)
    sup_all = cfg.train_supervision == "all"
    # rematerialize in the backward pass: storing 15 iterations of Sinkhorn
    # plans + MLP intermediates (>4 GB at batch 16 / N 1024) blows HBM;
    # recompute costs ~1.3x forward time instead. cfg.train_remat picks the
    # policy ('full' | 'dots' | 'attn' | 'attn_head' | 'none' — MatcherConfig).
    if cfg.train_fused:
        # custom-VJP fused layers: each layer op stores exactly
        # (x, q_used, k_used, attn out, lse) and its backward neither replays
        # the body nor runs any fp32 MXU pass; only the score head + loss
        # stay under full remat
        bq = block_q or 256
        layer_self = _make_fused_layer(True, h, cfg.ac_fn, bq, interpret)
        layer_cross = _make_fused_layer(False, h, cfg.ac_fn, bq, interpret)
        mask_f = mask.astype(jnp.float32)
        mask_swap_f = mask_swap.astype(jnp.float32)
        # train_remat='attn_head' composes with the fused layers: the score
        # head runs OUTSIDE remat, so its backward reuses stored residuals
        # (dist + Sinkhorn u/v) instead of replaying the projection + 20-sweep
        # OT chain per iteration; every other policy keeps the head under
        # full remat (minimum HBM residency)
        head_ckpt = (head_part if cfg.train_remat == "attn_head"
                     else jax.checkpoint(head_part, prevent_cse=False))

        def body_fused(carry, per_it):
            desc, qk_self, qk_cross, terms, score = carry
            desc, qs, ks = layer_self(desc, qk_self["q"], qk_self["k"],
                                      per_it["self"], mask_f, mask_f)
            desc, qc, kc = layer_cross(desc, qk_cross["q"], qk_cross["k"],
                                       per_it["cross"], mask_swap_f, mask_f)
            if sup_all:
                terms, score = head_ckpt(desc, per_it, terms)
            return (desc, {"q": qs, "k": ks}, {"q": qc, "k": kc}, terms,
                    score), None

        body_ckpt = body_fused
    elif cfg.train_remat == "attn_head":
        # remat ONLY the attention blocks (kernel outputs saved by name); the
        # score head + loss stay OUTSIDE the remat region so the Sinkhorn
        # custom-VJP residuals (per-sweep u/v history) are stored once
        # instead of the whole u/v marginal loop replaying in the backward
        attn_ckpt = _remat(attn_part, "attn")

        def body(carry, per_it):
            desc, qk_self, qk_cross, terms, score = carry
            desc, qk_self, qk_cross = attn_ckpt(desc, qk_self, qk_cross, per_it)
            if sup_all:
                terms, score = head_part(desc, per_it, terms)
            return (desc, qk_self, qk_cross, terms, score), None

        body_ckpt = body
    else:
        def body(carry, per_it):
            desc, qk_self, qk_cross, terms, score = carry
            desc, qk_self, qk_cross = attn_part(desc, qk_self, qk_cross, per_it)
            if sup_all:
                terms, score = head_part(desc, per_it, terms)
            return (desc, qk_self, qk_cross, terms, score), None

        body_ckpt = _remat(body, cfg.train_remat)
    (desc, _, _, terms, last_score), _ = jax.lax.scan(
        body_ckpt, (desc, zero_qk, zero_qk, zero_terms, zero_score), per_it)

    if sup_all:
        n_it = cfg.n_layers
        terms = jax.tree.map(lambda x: x / n_it, terms)
    else:
        last_it = {"final_w": stacked["final_w"][-1],
                   "final_b": stacked["final_b"][-1]}
        terms, last_score = head_part(desc, last_it, terms)
    matching_loss = terms["corr"] + terms["incorr"] + terms["neg"]
    loss = matching_loss
    if epi is not None:
        loss = loss + cfg.geo_weight * terms["geo"]
    idx0, idx1, ms0, ms1 = model.compute_matches(
        last_score, p=cfg.match_threshold, valid0=valid0, valid1=valid1)
    acc = matching_accuracy(idx0, gt)
    return {
        "loss": loss,
        "matching_loss": matching_loss,
        "matching_loss_corr": terms["corr"],
        "matching_loss_incorr": terms["incorr"],
        "matching_loss_neg": terms["neg"],
        "geo_loss": terms.get("geo", jnp.zeros(())),
        "matching_scores0": ms0,
        "matches0": idx0,
        **acc,
    }


def _eimp_make_body(model, stacked, b, p, mscore_th, uncertainty_ratio,
                    interpret, compute_dtype):
    """Scan body shared by the mask-only and bucket-compacted EIMP paths:
    self+cross attention under the current keep masks, fused Sinkhorn ->
    matches + pooling masses, conditional pooling. Shapes are taken from the
    carry, so the same body serves every compaction bucket size."""
    from impx.ops.matching import matches_from_stats
    from impx.ops.pallas.attention import attention_key_mass
    from impx.ops.pallas.sinkhorn import sinkhorn_fused_stats

    cfg = model.config

    def swap(x):
        return jnp.concatenate([x[b:], x[:b]], axis=0)

    def body(carry, per_it):
        # full0/full1: ALL real tokens (fixed across pooling) — the reference
        # keeps discarded keypoints in the tensors, still updates them as
        # queries, and includes them in InstanceNorm statistics and in the
        # attention-mass sums (adgm.py:424-427 sums the whole prob tensor);
        # only attention KEYS and the score matrix see the keep masks
        desc, qk_self, qk_cross, keep0, keep1, full0, full1 = carry
        n = keep0.shape[1]
        keep = jnp.concatenate([keep0, keep1], axis=0)
        keep_swap = jnp.concatenate([keep1, keep0], axis=0)
        full = jnp.concatenate([full0, full1], axis=0)

        delta, qk_self = _attn_block(
            per_it["self"], desc, desc, qk_self, keep, full,
            cfg.num_heads, cfg.ac_fn, compute_dtype, interpret,
            block_q=cfg.attn_block_q)
        desc = desc + delta
        delta, qk_cross = _attn_block(
            per_it["cross"], desc, swap(desc), qk_cross, keep_swap, full,
            cfg.num_heads, cfg.ac_fn, compute_dtype, interpret,
            block_q=cfg.attn_block_q)
        desc = desc + delta

        pl = {"final_proj": [{"w": per_it["final_w"], "b": per_it["final_b"]}],
              "bin_score": stacked["bin_score"]}
        d0, d1 = desc[:b].astype(jnp.float32), desc[b:].astype(jnp.float32)
        dist = model.compute_distance(pl, d0, d1, layer_id=-1)
        keep0_used, keep1_used = keep0, keep1
        if cfg.with_sinkhorn:
            # fused kernel: matches + pooling masses with no HBM plan
            stats = sinkhorn_fused_stats(
                dist, stacked["bin_score"], cfg.sinkhorn_iterations,
                keep0, keep1, interpret=interpret)
            idx0, _, ms0, _ = matches_from_stats(
                stats["max0"], stats["idx0"], stats["idx1"], p, keep0, keep1)
            rowmass, colmass = stats["rowmass"], stats["colmass"]
            uv = (stats["u"], stats["v"])
        else:
            score = model.compute_score(pl, dist, keep0, keep1)
            idx0, _, ms0, _ = model.compute_matches(score, p=p, valid0=keep0,
                                                    valid1=keep1)
            inner = score[:, :-1, :-1]
            rowmass = jnp.sum(inner, axis=2)
            colmass = jnp.sum(inner, axis=1)
            uv = (jnp.zeros((b, n + 1)), jnp.zeros((b, n + 1)))

        def pool(operands):
            rowmass, colmass, qk_self, qk_cross, keep0, keep1 = operands
            keep = jnp.concatenate([keep0, keep1], axis=0)
            keep_swap = jnp.concatenate([keep1, keep0], axis=0)
            m_self = attention_key_mass(qk_self["q"], qk_self["k"],
                                        keep, full, interpret=interpret)
            m_cross = attention_key_mass(qk_cross["q"], qk_cross["k"],
                                         keep_swap, full, interpret=interpret)
            norm = lambda m: m / (jnp.sum(m, axis=1, keepdims=True) + 1e-15)
            n00, n11 = norm(m_self[:b]), norm(m_self[b:])
            n10, n01 = norm(m_cross[:b]), norm(m_cross[b:])
            return model._pool_from_masses(
                rowmass, colmass, n00, n01, n11, n10, keep0, keep1,
                mscore_th * uncertainty_ratio, cfg.n_min_tokens)

        keep0, keep1 = jax.lax.cond(
            per_it["do_pool"] > 0.5, pool, lambda op: (op[4], op[5]),
            (rowmass, colmass, qk_self, qk_cross, keep0, keep1))

        return ((desc, qk_self, qk_cross, keep0, keep1, full0, full1),
                (idx0, ms0, uv, keep0_used, keep1_used))

    return body


def _eimp_encode(model, stacked, data):
    """Shared input encoding for the EIMP scan paths. Returns
    (desc [2B,N,D], keep0, keep1, zero_qk, b, n)."""
    cfg = model.config
    compute_dtype = model.compute_dtype
    valid0 = data.get("valid0")
    valid1 = data.get("valid1")
    b, n = data["descriptors0"].shape[:2]
    if valid0 is None:
        valid0 = jnp.ones((b, n), bool)
    if valid1 is None:
        valid1 = jnp.ones((b, data["descriptors1"].shape[1]), bool)
    assert data["descriptors1"].shape[1] == n, "EIMP scan path expects equal buckets"

    enc0, _ = model.encode_keypoint(
        {"kenc": stacked["kenc"]}, data["norm_keypoints0"], data["scores0"], valid0)
    enc1, _ = model.encode_keypoint(
        {"kenc": stacked["kenc"]}, data["norm_keypoints1"], data["scores1"], valid1)
    desc = jnp.concatenate([data["descriptors0"] + enc0,
                            data["descriptors1"] + enc1], axis=0)
    if compute_dtype is not None:
        desc = desc.astype(compute_dtype)
    h = cfg.num_heads
    dh = cfg.descriptor_dim // h
    zero_qk = {
        "q": jnp.zeros((2 * b, h, n, dh), compute_dtype or jnp.float32),
        "k": jnp.zeros((2 * b, h, n, dh), compute_dtype or jnp.float32),
    }
    return desc, valid0, valid1, zero_qk, b, n


def _eimp_do_pool(cfg):
    sharing = cfg.sharing_layers(True)
    return jnp.asarray([
        1.0 if (sharing[2 * ni] and ni >= cfg.first_it_to_update) else 0.0
        for ni in range(cfg.n_layers)], jnp.float32)


def forward_scan_eimp(
    model,
    stacked: dict,
    data: dict[str, Any],
    p: float = 0.2,
    mscore_th: float = 0.1,
    uncertainty_ratio: float = 1.0,
    only_last: bool = False,
    with_scores: bool = True,
):
    """AdaGMN produce_matches on the scan fast path: per-iteration Sinkhorn +
    matches inside the body, adaptive pooling on updating iterations via the
    attention column-mass kernel (probabilities never materialize). With the
    fused Sinkhorn kernel, matches and pooling masses come straight from the
    kernel stats — no [B,N+1,M+1] plan ever reaches HBM (with_scores=True
    rebuilds only the last iteration's plan in one pass).

    Mass bookkeeping on the stacked batch: the self qk-state gives key masses
    [m00; m11] for rows [0:B; B:2B]; the cross state (source swapped) gives
    [m10; m01] — exactly the four statistics of reference adgm.py:424-432.
    """
    from impx.ops.pallas.sinkhorn import sinkhorn_plan_from_uv

    cfg = model.config
    assert cfg.norm_fn == "in"
    interpret = _interpret()
    compute_dtype = model.compute_dtype

    desc, keep0, keep1, zero_qk, b, n = _eimp_encode(model, stacked, data)
    body = _eimp_make_body(model, stacked, b, p, mscore_th, uncertainty_ratio,
                           interpret, compute_dtype)
    per_it = {
        "self": stacked["self"], "cross": stacked["cross"],
        "final_w": stacked["final_w"], "final_b": stacked["final_b"],
        "do_pool": _eimp_do_pool(cfg),
    }
    carry0 = (desc, zero_qk, zero_qk, keep0, keep1, keep0, keep1)
    (desc, _, _, keep0, keep1, _, _), (all_idx0, all_ms0, all_uv, k0u, k1u) = \
        jax.lax.scan(body, carry0, per_it)

    if with_scores:
        # materialize only the LAST iteration's plan, in one fused pass
        pl = {"final_proj": [
            {"w": stacked["final_w"][-1], "b": stacked["final_b"][-1]}],
            "bin_score": stacked["bin_score"]}
        d0, d1 = desc[:b].astype(jnp.float32), desc[b:].astype(jnp.float32)
        dist = model.compute_distance(pl, d0, d1, layer_id=-1)
        if cfg.with_sinkhorn:
            last_score = sinkhorn_plan_from_uv(
                dist, stacked["bin_score"], all_uv[0][-1], all_uv[1][-1],
                k0u[-1], k1u[-1])
        else:
            last_score = model.compute_score(pl, dist, k0u[-1], k1u[-1])
        scores = [last_score]
    else:
        scores = [None]

    if only_last:
        return {"scores": scores, "indices0": [all_idx0[-1]],
                "mscores0": [all_ms0[-1]], "keep0": keep0, "keep1": keep1}
    nI = cfg.n_layers
    return {"scores": scores,
            "indices0": [all_idx0[i] for i in range(nI)],
            "mscores0": [all_ms0[i] for i in range(nI)],
            "keep0": keep0, "keep1": keep1}


# --------------------------------------------------------------------------
# EIMP bucketed compaction: the pooling masks physically shrink the problem.

def _stable_topk_indices(keep, k):
    """Indices of the first k slots ordered (kept first, original order within
    class) — the gathered set always contains every survivor when
    #survivors <= k, so downstream masked computation is exactly the
    mask-only path restricted to a superset of the survivors."""
    n = keep.shape[1]
    rank = keep.astype(jnp.float32) - \
        jnp.arange(n, dtype=jnp.float32)[None] / (2.0 * n)
    _, idx = jax.lax.top_k(rank, k)
    return idx.astype(jnp.int32)


def _compact_gather(desc, qk_self, qk_cross, keep0, keep1, g0, g1, b, k,
                    i0=None, i1=None):
    """Gather both images' keypoint sets into k slots (reference adgm.py's
    dynamic slicing, static-shape version; gids track original indices,
    adgm.py:212-215). i0/i1 let the caller precompute the slot indices (the
    training path also gathers the GT mask with them)."""
    if i0 is None:
        i0 = _stable_topk_indices(keep0, k)
    if i1 is None:
        i1 = _stable_topk_indices(keep1, k)
    take = lambda x, i: jnp.take_along_axis(x, i, axis=1)
    d0 = jnp.take_along_axis(desc[:b], i0[:, :, None], axis=1)
    d1 = jnp.take_along_axis(desc[b:], i1[:, :, None], axis=1)

    def gather_qk(t):  # [2B, H, n, dh] -> [2B, H, k, dh]
        a = jnp.take_along_axis(t[:b], i0[:, None, :, None], axis=2)
        c = jnp.take_along_axis(t[b:], i1[:, None, :, None], axis=2)
        return jnp.concatenate([a, c], axis=0)

    return (jnp.concatenate([d0, d1], axis=0),
            jax.tree.map(gather_qk, qk_self),
            jax.tree.map(gather_qk, qk_cross),
            take(keep0, i0), take(keep1, i1),
            take(g0, i0), take(g1, i1))


def _scatter_matches(idx_local, ms_local, g0, g1, n_orig):
    """Map segment-local matches back to original keypoint indexing."""
    bsz, k = idx_local.shape
    tgt = jnp.where(
        idx_local >= 0,
        jnp.take_along_axis(g1, jnp.clip(idx_local, 0, k - 1), axis=1), -1)
    rows = jnp.arange(bsz)[:, None]
    out_idx = jnp.full((bsz, n_orig), -1, jnp.int32).at[rows, g0].set(tgt)
    out_ms = jnp.zeros((bsz, n_orig), ms_local.dtype).at[rows, g0].set(ms_local)
    return out_idx, out_ms


def forward_scan_eimp_compact(
    model,
    stacked: dict,
    data: dict[str, Any],
    p: float = 0.2,
    mscore_th: float = 0.1,
    uncertainty_ratio: float = 1.0,
    only_last: bool = False,
    **_,
):
    """EIMP with REAL FLOP savings: runs the iteration scan in segments, and
    at each configured (iteration, bucket) point gathers the surviving
    keypoints of both images into the smaller bucket, so attention and
    Sinkhorn costs shrink like the reference's dynamic slicing
    (reference adgm.py:463-506, eval/matching.py:166-174) while every segment
    stays XLA-static. Matches are emitted in ORIGINAL keypoint indexing via
    carried global ids.

    Semantics note: each gather implements the reference's SLICED pooling
    (eval/matching.py:166-174 physically drops tokens) — after a gather, the
    survivors become the whole tensor, so InstanceNorm statistics and
    attention-mass sums no longer see discarded tokens. The mask-only path
    (forward_scan_eimp) instead mirrors produce_matches (full-size tensors;
    discarded tokens still normalized/updated, reference adgm.py:374-432).
    The two agree exactly while nothing has been discarded before a gather
    (tests/test_eimp_compact.py), and approximately afterwards — the same
    relationship the reference's two eval modes have to each other. Overflow
    drops the highest-index survivors (deterministic) and is REPORTED: the
    output carries per-pair 'overflow0'/'overflow1' counts (total survivors
    dropped across all compaction points) so callers can fall back to the
    mask-only path — the reference keeps all survivors (adgm.py:463-506),
    so a silent drop is never acceptable (impx.eval.eval_imp re-runs
    overflowed pairs mask-only).

    The transport plan is never materialized on this path ('scores' is
    [None]); eval consumers use indices0/mscores0.
    """
    cfg = model.config
    assert cfg.norm_fn == "in"
    assert cfg.compaction, "forward_scan_eimp_compact needs cfg.compaction"
    interpret = _interpret()
    compute_dtype = model.compute_dtype

    desc, keep0, keep1, zero_qk, b, n = _eimp_encode(model, stacked, data)
    body = _eimp_make_body(model, stacked, b, p, mscore_th, uncertainty_ratio,
                           interpret, compute_dtype)
    per_it_full = {
        "self": stacked["self"], "cross": stacked["cross"],
        "final_w": stacked["final_w"], "final_b": stacked["final_b"],
        "do_pool": _eimp_do_pool(cfg),
    }

    schedule = sorted((int(it), int(k)) for it, k in cfg.compaction)
    assert all(0 < it < cfg.n_layers for it, _ in schedule), schedule
    assert all(schedule[i][0] < schedule[i + 1][0]
               for i in range(len(schedule) - 1)), \
        ("compaction iterations must be distinct", schedule)
    bounds = [0] + [it for it, _ in schedule] + [cfg.n_layers]
    buckets = [n] + [k for _, k in schedule]
    assert all(buckets[i] >= buckets[i + 1] for i in range(len(buckets) - 1)), \
        ("compaction buckets must be non-increasing", buckets)

    g0 = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[None], (b, n))
    g1 = g0
    qk_self = qk_cross = zero_qk
    full0, full1 = keep0, keep1  # IN / mass query masks (reset at each gather)
    overflow0 = jnp.zeros((b,), jnp.int32)
    overflow1 = jnp.zeros((b,), jnp.int32)
    outs = []  # (idx_orig [B, n], ms_orig [B, n]) per iteration
    for si in range(len(bounds) - 1):
        if si > 0:
            # survivors that don't fit the next bucket get dropped by the
            # gather — count them so the caller can detect and recover
            k = buckets[si]
            overflow0 += jnp.maximum(jnp.sum(keep0, axis=1) - k, 0).astype(jnp.int32)
            overflow1 += jnp.maximum(jnp.sum(keep1, axis=1) - k, 0).astype(jnp.int32)
            desc, qk_self, qk_cross, keep0, keep1, g0, g1 = _compact_gather(
                desc, qk_self, qk_cross, keep0, keep1, g0, g1, b, buckets[si])
            # the gather physically drops discarded tokens (the reference's
            # SLICED semantics, eval/matching.py:166-174): the surviving set
            # becomes the new "all tokens" for IN stats and mass sums
            full0, full1 = keep0, keep1
        per_it = jax.tree.map(lambda x: x[bounds[si]:bounds[si + 1]], per_it_full)
        carry = (desc, qk_self, qk_cross, keep0, keep1, full0, full1)
        (desc, qk_self, qk_cross, keep0, keep1, full0, full1), \
            (idx0s, ms0s, _, _, _) = jax.lax.scan(body, carry, per_it)
        for j in range(bounds[si + 1] - bounds[si]):
            outs.append(_scatter_matches(idx0s[j], ms0s[j], g0, g1, n))

    rows = jnp.arange(b)[:, None]
    keep0_orig = jnp.zeros((b, n), bool).at[rows, g0].set(keep0)
    keep1_orig = jnp.zeros((b, n), bool).at[rows, g1].set(keep1)

    picked = outs[-1:] if only_last else outs
    return {"scores": [None],
            "indices0": [o[0] for o in picked],
            "mscores0": [o[1] for o in picked],
            "keep0": keep0_orig, "keep1": keep1_orig,
            "overflow0": overflow0, "overflow1": overflow1}


def forward_train_scan_eimp(model, stacked: dict, data: dict[str, Any]):
    """AdaGMN training forward on the scan fast path (reference
    adgm.py:49-325 semantics, numerically equivalent to the unrolled
    `_iterate` training path): per-iteration Sinkhorn + GraphLoss with the
    GT mask restricted to surviving keypoints after pooling, pooling masses
    from the attention column-mass kernel under stop_gradient, accuracy
    averaged over ALL iterations. One scan body instead of a 15x unrolled
    graph — compiles once per layer shape and remats per cfg.train_remat."""
    from impx.models.adgm import _masked_gt
    from impx.models.loss import (geo_loss, graph_loss, matching_accuracy,
                                  maybe_epipolar_matrix)
    from impx.ops.pallas.attention import attention_key_mass

    cfg = model.config
    assert cfg.norm_fn == "in"
    interpret = _interpret()
    compute_dtype = model.compute_dtype

    gt = data["matching_mask"]
    epi = maybe_epipolar_matrix(data, cfg.geo_clamp) if cfg.with_geo else None
    p, mscore_th, uncertainty_ratio = 0.2, 0.1, 1.0  # training defaults

    desc, valid0, valid1, zero_qk, b, n = _eimp_encode(model, stacked, data)
    full0, full1 = valid0, valid1
    full = jnp.concatenate([full0, full1], axis=0)

    def swap(x):
        return jnp.concatenate([x[b:], x[:b]], axis=0)

    per_it = {"self": stacked["self"], "cross": stacked["cross"],
              "final_w": stacked["final_w"], "final_b": stacked["final_b"],
              "do_pool": _eimp_do_pool(cfg),
              "use_masked": jnp.asarray(
                  [1.0 if ni >= cfg.first_it_to_update else 0.0
                   for ni in range(cfg.n_layers)], jnp.float32)}

    z = jnp.zeros(())
    zero_terms = {"corr": z, "incorr": z, "neg": z}
    if epi is not None:
        zero_terms["geo"] = z
    zero_acc = {"acc_corr": z, "acc_incorr": z,
                "total_acc_corr": z, "total_acc_incorr": z}
    m1 = valid1.shape[1]
    zero_score = jnp.zeros((b, n + 1, m1 + 1), jnp.float32)
    zero_idx = jnp.zeros((b, n), jnp.int32)
    zero_ms = jnp.zeros((b, n), jnp.float32)
    # same training q-block rule as forward_train_scan (single full-N block
    # at the published training sizes removes bwd dk/dv accumulation sweeps)
    block_q = cfg.attn_block_q or (n if n <= 1024 else None)

    def body(carry, it):
        desc, qk_self, qk_cross, keep0, keep1, terms, acc, _, _, _ = carry
        keep = jnp.concatenate([keep0, keep1], axis=0)
        keep_swap = jnp.concatenate([keep1, keep0], axis=0)

        delta, qk_self = _attn_block(
            it["self"], desc, desc, qk_self, keep, full,
            cfg.num_heads, cfg.ac_fn, compute_dtype, interpret,
            block_q=block_q)
        desc = desc + delta
        delta, qk_cross = _attn_block(
            it["cross"], desc, swap(desc), qk_cross, keep_swap, full,
            cfg.num_heads, cfg.ac_fn, compute_dtype, interpret,
            block_q=block_q)
        desc = desc + delta

        pl = {"final_proj": [{"w": it["final_w"], "b": it["final_b"]}],
              "bin_score": stacked["bin_score"]}
        d0, d1 = desc[:b].astype(jnp.float32), desc[b:].astype(jnp.float32)
        dist = model.compute_distance(pl, d0, d1, layer_id=-1)
        score = model.compute_score(pl, dist, keep0, keep1)

        # loss: plain gt before first_it_to_update, survivor-restricted
        # after (reference adgm.py:219-230; keeps only change after the
        # first pooling, so the where() is exact, not approximate)
        gt_used = jnp.where(it["use_masked"] > 0.5,
                            _masked_gt(gt, keep0, keep1), gt)
        t = graph_loss(score, gt_used, scores_are_log=model.scores_are_log)
        if epi is not None:
            prob = jnp.exp(score) if model.scores_are_log else score
            t["geo"] = geo_loss(prob, epi, keep0, keep1)
        terms = jax.tree.map(jnp.add, terms, t)

        idx0, _, ms0, _ = model.compute_matches(score, p=p, valid0=keep0,
                                                valid1=keep1)
        acc = jax.tree.map(jnp.add, acc, matching_accuracy(idx0, gt))

        # pooling (stop_gradient, reference adgm.py:242-243) on updating
        # iterations, from the fused column-mass kernel
        def pool(operands):
            qk_self, qk_cross, keep0, keep1, score = operands
            keep = jnp.concatenate([keep0, keep1], axis=0)
            keep_swap = jnp.concatenate([keep1, keep0], axis=0)
            m_self = attention_key_mass(qk_self["q"], qk_self["k"],
                                        keep, full, interpret=interpret)
            m_cross = attention_key_mass(qk_cross["q"], qk_cross["k"],
                                         keep_swap, full, interpret=interpret)
            norm = lambda m: m / (jnp.sum(m, axis=1, keepdims=True) + 1e-15)
            n00, n11 = norm(m_self[:b]), norm(m_self[b:])
            n10, n01 = norm(m_cross[:b]), norm(m_cross[b:])
            inner = score[:, :-1, :-1]
            return model._pool_from_masses(
                jnp.sum(inner, axis=2), jnp.sum(inner, axis=1),
                n00, n01, n11, n10, keep0, keep1,
                mscore_th * uncertainty_ratio, cfg.n_min_tokens)

        keep0, keep1 = jax.lax.cond(
            it["do_pool"] > 0.5, pool, lambda op: (op[2], op[3]),
            (jax.lax.stop_gradient(qk_self), jax.lax.stop_gradient(qk_cross),
             keep0, keep1, jax.lax.stop_gradient(score)))

        return (desc, qk_self, qk_cross, keep0, keep1, terms, acc,
                score, idx0, ms0), None

    carry0 = (desc, zero_qk, zero_qk, valid0, valid1, zero_terms, zero_acc,
              zero_score, zero_idx, zero_ms)
    # 'attn_head' maps to 'attn' here: the EIMP body interleaves pooling with
    # the score head, so the head can't be lifted out of the remat region
    body_ckpt = _remat(body, "attn" if cfg.train_remat == "attn_head"
                       else cfg.train_remat)
    (desc, _, _, keep0, keep1, terms, acc, last_score, last_idx0,
     last_ms0), _ = jax.lax.scan(body_ckpt, carry0, per_it)

    n_it = cfg.n_layers
    terms = jax.tree.map(lambda x: x / n_it, terms)
    acc = jax.tree.map(lambda x: x / n_it, acc)
    matching_loss = terms["corr"] + terms["incorr"] + terms["neg"]
    loss = matching_loss
    if epi is not None:
        loss = loss + cfg.geo_weight * terms["geo"]
    return {
        "loss": loss,
        "matching_loss": matching_loss,
        "matching_loss_corr": terms["corr"],
        "matching_loss_incorr": terms["incorr"],
        "matching_loss_neg": terms["neg"],
        "geo_loss": terms.get("geo", jnp.zeros(())),
        "matching_scores0": last_ms0,
        "matches0": last_idx0,
        **acc,
    }


def _gather_gt(gt, i0, i1):
    """Gather the (N+1)x(M+1) GT assignment mask into local bucket space:
    rows by i0 + the dustbin row, cols by i1 + the dustbin col. GT rows/cols
    of tokens outside the gathered set simply vanish — the sliced-pooling
    semantics (their matches are no longer supervisable once the tokens are
    physically dropped)."""
    b, n1, m1 = gt.shape
    ri = jnp.concatenate(
        [i0, jnp.full((b, 1), n1 - 1, jnp.int32)], axis=1)  # [b, k+1]
    ci = jnp.concatenate(
        [i1, jnp.full((b, 1), m1 - 1, jnp.int32)], axis=1)
    g = jnp.take_along_axis(gt, ri[:, :, None], axis=1)
    return jnp.take_along_axis(g, ci[:, None, :], axis=2)


def forward_train_scan_eimp_compact(model, stacked: dict, data: dict[str, Any]):
    """AdaGMN training with BUCKETED COMPACTION: the eval path's physical
    token gathering (forward_scan_eimp_compact) applied to the training scan,
    so late-iteration attention/Sinkhorn/loss run on the pooled survivor set
    instead of masked full-size tensors. Beyond the reference, which always
    trains full-size with masks (adgm.py:49-325); this is the sliced-pooling
    semantics of its eval loop (eval/matching.py:166-174) brought to
    training: after each cfg.train_compaction point, discarded tokens are
    physically gone — no longer attention queries and no longer in
    InstanceNorm statistics. Identical to forward_train_scan_eimp while no
    token has been discarded before a gather (tests/test_fast_train.py pins
    loss AND grads); afterwards it is a deliberately different (cheaper)
    training objective, reported per step via compaction overflow counters.

    The GT mask is gathered alongside the keypoints (_gather_gt), the loss
    runs in local bucket space, and matches/accuracy are scattered back to
    original indexing so the step metrics stay comparable with the masked
    trainer."""
    from impx.models.adgm import _masked_gt
    from impx.models.loss import (geo_loss, graph_loss, matching_accuracy,
                                  maybe_epipolar_matrix)
    from impx.ops.pallas.attention import attention_key_mass

    cfg = model.config
    assert cfg.norm_fn == "in"
    assert cfg.train_compaction, "needs cfg.train_compaction"
    interpret = _interpret()
    compute_dtype = model.compute_dtype

    gt = data["matching_mask"].astype(jnp.float32)
    epi = maybe_epipolar_matrix(data, cfg.geo_clamp) if cfg.with_geo else None
    p, mscore_th, uncertainty_ratio = 0.2, 0.1, 1.0  # training defaults

    desc, keep0, keep1, zero_qk, b, n = _eimp_encode(model, stacked, data)

    per_it_full = {
        "self": stacked["self"], "cross": stacked["cross"],
        "final_w": stacked["final_w"], "final_b": stacked["final_b"],
        "do_pool": _eimp_do_pool(cfg),
        "use_masked": jnp.asarray(
            [1.0 if ni >= cfg.first_it_to_update else 0.0
             for ni in range(cfg.n_layers)], jnp.float32)}

    schedule = sorted((int(it), int(k)) for it, k in cfg.train_compaction)
    assert all(0 < it < cfg.n_layers for it, _ in schedule), schedule
    assert all(schedule[i][0] < schedule[i + 1][0]
               for i in range(len(schedule) - 1)), \
        ("train_compaction iterations must be distinct", schedule)
    bounds = [0] + [it for it, _ in schedule] + [cfg.n_layers]
    buckets = [n] + [k for _, k in schedule]
    assert all(buckets[i] >= buckets[i + 1] for i in range(len(buckets) - 1)), \
        ("compaction buckets must be non-increasing", buckets)

    def make_body(gt_seg, epi_seg, full0, full1):
        full = jnp.concatenate([full0, full1], axis=0)
        bsz = full0.shape[0]

        def swap(x):
            return jnp.concatenate([x[bsz:], x[:bsz]], axis=0)

        n_seg = full0.shape[1]
        block_q = cfg.attn_block_q or (n_seg if n_seg <= 1024 else None)

        def body(carry, it):
            desc, qk_self, qk_cross, keep0, keep1, terms = carry
            keep = jnp.concatenate([keep0, keep1], axis=0)
            keep_swap = jnp.concatenate([keep1, keep0], axis=0)

            delta, qk_self = _attn_block(
                it["self"], desc, desc, qk_self, keep, full,
                cfg.num_heads, cfg.ac_fn, compute_dtype, interpret,
                block_q=block_q)
            desc = desc + delta
            delta, qk_cross = _attn_block(
                it["cross"], desc, swap(desc), qk_cross, keep_swap, full,
                cfg.num_heads, cfg.ac_fn, compute_dtype, interpret,
                block_q=block_q)
            desc = desc + delta

            pl = {"final_proj": [{"w": it["final_w"], "b": it["final_b"]}],
                  "bin_score": stacked["bin_score"]}
            d0, d1 = desc[:b].astype(jnp.float32), desc[b:].astype(jnp.float32)
            dist = model.compute_distance(pl, d0, d1, layer_id=-1)
            score = model.compute_score(pl, dist, keep0, keep1)

            gt_used = jnp.where(it["use_masked"] > 0.5,
                                _masked_gt(gt_seg, keep0, keep1), gt_seg)
            t = graph_loss(score, gt_used, scores_are_log=model.scores_are_log)
            if epi_seg is not None:
                prob = jnp.exp(score) if model.scores_are_log else score
                t["geo"] = geo_loss(prob, epi_seg, keep0, keep1)
            terms = jax.tree.map(jnp.add, terms, t)

            idx0, _, ms0, _ = model.compute_matches(score, p=p, valid0=keep0,
                                                    valid1=keep1)

            def pool(operands):
                qk_self, qk_cross, keep0, keep1, score = operands
                keep = jnp.concatenate([keep0, keep1], axis=0)
                keep_swap = jnp.concatenate([keep1, keep0], axis=0)
                m_self = attention_key_mass(qk_self["q"], qk_self["k"],
                                            keep, full, interpret=interpret)
                m_cross = attention_key_mass(qk_cross["q"], qk_cross["k"],
                                             keep_swap, full,
                                             interpret=interpret)
                norm = lambda m: m / (jnp.sum(m, axis=1, keepdims=True) + 1e-15)
                n00, n11 = norm(m_self[:b]), norm(m_self[b:])
                n10, n01 = norm(m_cross[:b]), norm(m_cross[b:])
                inner = score[:, :-1, :-1]
                return model._pool_from_masses(
                    jnp.sum(inner, axis=2), jnp.sum(inner, axis=1),
                    n00, n01, n11, n10, keep0, keep1,
                    mscore_th * uncertainty_ratio, cfg.n_min_tokens)

            keep0, keep1 = jax.lax.cond(
                it["do_pool"] > 0.5, pool, lambda op: (op[2], op[3]),
                (jax.lax.stop_gradient(qk_self),
                 jax.lax.stop_gradient(qk_cross),
                 keep0, keep1, jax.lax.stop_gradient(score)))

            return (desc, qk_self, qk_cross, keep0, keep1, terms), (idx0, ms0)

        return body

    z = jnp.zeros(())
    terms = {"corr": z, "incorr": z, "neg": z}
    if epi is not None:
        terms["geo"] = z

    g0 = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[None], (b, n))
    g1 = g0
    qk_self = qk_cross = zero_qk
    full0, full1 = keep0, keep1
    gt_seg, epi_seg = gt, epi
    overflow0 = jnp.zeros((b,), jnp.int32)
    overflow1 = jnp.zeros((b,), jnp.int32)
    outs = []  # (idx_orig [B, n], ms_orig [B, n]) per iteration
    for si in range(len(bounds) - 1):
        if si > 0:
            k = buckets[si]
            overflow0 += jnp.maximum(jnp.sum(keep0, axis=1) - k, 0).astype(jnp.int32)
            overflow1 += jnp.maximum(jnp.sum(keep1, axis=1) - k, 0).astype(jnp.int32)
            i0 = _stable_topk_indices(keep0, k)
            i1 = _stable_topk_indices(keep1, k)
            desc, qk_self, qk_cross, keep0, keep1, g0, g1 = _compact_gather(
                desc, qk_self, qk_cross, keep0, keep1, g0, g1, b, k,
                i0=i0, i1=i1)
            gt_seg = _gather_gt(gt_seg, i0, i1)
            if epi_seg is not None:
                e = jnp.take_along_axis(epi_seg, i0[:, :, None], axis=1)
                epi_seg = jnp.take_along_axis(e, i1[:, None, :], axis=2)
            full0, full1 = keep0, keep1
        per_it = jax.tree.map(lambda x: x[bounds[si]:bounds[si + 1]],
                              per_it_full)
        body = make_body(gt_seg, epi_seg, full0, full1)
        body_ckpt = _remat(body, "attn" if cfg.train_remat == "attn_head"
                           else cfg.train_remat)
        carry = (desc, qk_self, qk_cross, keep0, keep1, terms)
        (desc, qk_self, qk_cross, keep0, keep1, terms), (idx0s, ms0s) = \
            jax.lax.scan(body_ckpt, carry, per_it)
        for j in range(bounds[si + 1] - bounds[si]):
            outs.append(_scatter_matches(idx0s[j], ms0s[j], g0, g1, n))

    n_it = cfg.n_layers
    terms = jax.tree.map(lambda x: x / n_it, terms)
    matching_loss = terms["corr"] + terms["incorr"] + terms["neg"]
    loss = matching_loss
    if epi is not None:
        loss = loss + cfg.geo_weight * terms["geo"]

    # accuracy in ORIGINAL indexing vs the full GT, averaged over all
    # iterations — the same metric definition as the masked trainer (a
    # discarded token whose GT match is lost counts against acc_corr)
    accs = [matching_accuracy(idx, gt) for idx, _ in outs]
    acc = jax.tree.map(lambda *xs: sum(xs) / len(xs), *accs)
    last_idx0, last_ms0 = outs[-1]
    return {
        "loss": loss,
        "matching_loss": matching_loss,
        "matching_loss_corr": terms["corr"],
        "matching_loss_incorr": terms["incorr"],
        "matching_loss_neg": terms["neg"],
        "geo_loss": terms.get("geo", jnp.zeros(())),
        "matching_scores0": last_ms0,
        "matches0": last_idx0,
        "compaction_overflow0": jnp.sum(overflow0).astype(jnp.float32),
        "compaction_overflow1": jnp.sum(overflow1).astype(jnp.float32),
        **acc,
    }
