"""GM — the base SuperGlue-style graph matcher (IMP architecture).

Functional JAX re-design of reference nets/gm.py: keypoint encoding ->
alternating self/cross attention -> per-iteration final projection -> scaled
dot-product score -> Sinkhorn/dual-softmax with learned dustbin -> mutual-NN
matches. Parameters are an explicit pytree; every method is pure (params
first) and jit-friendly with static shapes + validity masks.

Differences from the reference (all TPU-motivated, behavior-preserving):
  * [B, N, D] layout (row-major matmuls on the MXU) instead of [B, D, N].
  * attention-sharing state (the reference's `self.self_prob0` etc.,
    gm.py:79-82) is carried explicitly through `forward_one_layer`.
  * variable keypoint counts are padding + masks, not dynamic shapes.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from impx.models.config import MatcherConfig
from impx.models.gnn import layer_apply, stack_init
from impx.ops.matching import compute_matches as _compute_matches
from impx.ops.mlp import dense_apply, dense_init, mlp_apply, mlp_init
from impx.ops.sinkhorn import dual_softmax, sink_algorithm
from impx.geometry.keypoints import normalize_keypoints


class GM:
    """Base matcher. Sharing disabled (reference GM uses AttentionalGNN)."""

    sharing = False

    def __init__(self, config: MatcherConfig):
        self.config = config
        self.compute_dtype = jnp.bfloat16 if config.compute_dtype == "bfloat16" else None

    # ------------------------------------------------------------------ init
    def init(self, key: jax.Array) -> dict[str, Any]:
        cfg = self.config
        k1, k2, k3 = jax.random.split(key, 3)
        d = cfg.descriptor_dim
        kenc = mlp_init(
            k1, [3, *cfg.keypoint_encoder, d], norm_fn=cfg.norm_fn, zero_last_bias=True
        )
        gnn = stack_init(k2, d, cfg.sharing_layers(self.sharing), norm_fn=cfg.norm_fn)
        kfp = jax.random.split(k3, cfg.n_layers)
        final_proj = [dense_init(kfp[i], d, d) for i in range(cfg.n_layers)]
        return {
            "kenc": kenc,
            "gnn": gnn,
            "final_proj": final_proj,
            "bin_score": jnp.asarray(1.0, jnp.float32),
        }

    # ------------------------------------------------------------- building blocks
    def encode_keypoint(self, params, norm_kpts, scores, valid=None, train=False, axis_name=None):
        """MLP over (x, y, score) (reference gm.py:287-288, layers.py:80-90).
        Returns (enc [B,N,D], bn_stats)."""
        x = jnp.concatenate([norm_kpts, scores[..., None]], axis=-1)
        return mlp_apply(
            params["kenc"], x, norm_fn=self.config.norm_fn, ac_fn=self.config.ac_fn,
            mask=valid, train=train, axis_name=axis_name,
        )

    def _norm_kpts(self, data, which: int):
        key = f"norm_keypoints{which}"
        if key in data:
            return data[key]
        shape = data[f"image_shape{which}"]  # (..., H, W) static tuple
        return normalize_keypoints(data[f"keypoints{which}"], shape[-2], shape[-1])

    def compute_distance(self, params, desc0, desc1, layer_id: int = -1):
        """Final projection + scaled dot product (reference gm.py:290-295)."""
        p = params["final_proj"][layer_id]
        mdesc0 = dense_apply(p, desc0)
        mdesc1 = dense_apply(p, desc1)
        dist = jnp.einsum("bnd,bmd->bnm", mdesc0, mdesc1)
        return dist / (self.config.descriptor_dim ** 0.5)

    @property
    def scores_are_log(self) -> bool:
        """True when compute_score returns a LOG transport plan (the
        log-domain OT head; SuperGlue overrides this unconditionally)."""
        return self.config.log_ot

    def compute_score(self, params, dist, valid0=None, valid1=None):
        """Sinkhorn or dual-softmax with learned dustbin (reference gm.py:297-303);
        with config.log_ot the numerically-stable log-domain head
        (superglue.py:180-209) — fused iterated-logsumexp kernel under
        attn_impl='pallas' — replaces the non-log Sinkhorn (the preferred
        head for bf16 training)."""
        if self.config.log_ot:
            if self.config.attn_impl == "pallas":
                from impx.ops.attention import _interpret
                from impx.ops.pallas.log_sinkhorn import log_optimal_transport_fused

                return log_optimal_transport_fused(
                    dist, params["bin_score"], self.config.sinkhorn_iterations,
                    valid0, valid1, 128, _interpret())
            from impx.ops.sinkhorn import log_optimal_transport

            return log_optimal_transport(
                dist, params["bin_score"], self.config.sinkhorn_iterations,
                valid0, valid1)
        if self.config.with_sinkhorn:
            return sink_algorithm(
                dist, params["bin_score"], self.config.sinkhorn_iterations,
                valid0, valid1, plan_dtype=self.compute_dtype,
            )
        return dual_softmax(dist, params["bin_score"], valid0, valid1)

    def compute_matches(self, scores, p=0.2, valid0=None, valid1=None):
        if self.scores_are_log:  # mutual-NN on exp (reference superglue.py:424-437)
            scores = jnp.exp(scores)
        return _compute_matches(scores, p=p, valid0=valid0, valid1=valid1)

    # ------------------------------------------------------------- layer stepping
    def init_state(self) -> dict[str, Any]:
        """Carried attention-prob state for the iterative API."""
        return {"self_prob0": None, "self_prob1": None, "cross_prob0": None, "cross_prob1": None}

    def _apply_layer(self, layer_params, x, source, prob=None, key_mask=None, query_mask=None,
                     train=False, axis_name=None):
        """One attentional-propagation layer. The carried `prob` is the
        attention-sharing state: the [B,H,N,N] prob tensor on the XLA path, or
        a {'q','k'} projection dict on the fused Pallas path (identical math,
        no HBM prob traffic)."""
        cfg = self.config
        if cfg.attn_impl == "pallas" and not train:
            from impx.ops.attention import attention_from_qk, multi_head_attention_fused
            from impx.ops.mlp import mlp_apply

            if "attn" in layer_params:
                message, state = multi_head_attention_fused(
                    layer_params["attn"], x, source,
                    num_heads=cfg.num_heads, key_mask=key_mask,
                    compute_dtype=self.compute_dtype)
            else:
                assert prob is not None, "shared layer requires carried q/k state"
                message = attention_from_qk(
                    layer_params, source, prob,
                    num_heads=cfg.num_heads, key_mask=key_mask,
                    compute_dtype=self.compute_dtype)
                state = prob
            y = jnp.concatenate([x, message], axis=-1)
            delta, bn = mlp_apply(layer_params["mlp"], y, norm_fn=cfg.norm_fn,
                                  ac_fn=cfg.ac_fn, mask=query_mask)
            return delta, state, bn
        delta, prob, bn = layer_apply(
            layer_params, x, source,
            num_heads=cfg.num_heads, ac_fn=cfg.ac_fn, norm_fn=cfg.norm_fn,
            prob=prob, key_mask=key_mask, query_mask=query_mask,
            train=train, axis_name=axis_name, compute_dtype=self.compute_dtype,
        )
        return delta, prob, bn

    def forward_one_layer(self, params, desc0, desc1, layer_i: int, state=None,
                          valid0=None, valid1=None):
        """One self or cross layer on both images; functional version of
        reference gm.py:263-285 / gms.py:260-282 (state carries shared probs).
        Returns (desc0, desc1, new_state)."""
        if state is None:
            state = self.init_state()
        layer = params["gnn"][layer_i]
        is_cross = (layer_i % 2) == 1
        new_state = dict(state)
        if is_cross:
            delta0, prob1, _ = self._apply_layer(
                layer, desc0, desc1, prob=state["cross_prob1"], key_mask=valid1, query_mask=valid0)
            delta1, prob0, _ = self._apply_layer(
                layer, desc1, desc0, prob=state["cross_prob0"], key_mask=valid0, query_mask=valid1)
            new_state["cross_prob1"] = prob1
            new_state["cross_prob0"] = prob0
        else:
            delta0, prob0, _ = self._apply_layer(
                layer, desc0, desc0, prob=state["self_prob0"], key_mask=valid0, query_mask=valid0)
            delta1, prob1, _ = self._apply_layer(
                layer, desc1, desc1, prob=state["self_prob1"], key_mask=valid1, query_mask=valid1)
            new_state["self_prob0"] = prob0
            new_state["self_prob1"] = prob1
        return desc0 + delta0, desc1 + delta1, new_state

    # ------------------------------------------------------------------ forwards
    def _encode_inputs(self, params, data, train=False, axis_name=None):
        desc0, desc1 = data["descriptors0"], data["descriptors1"]
        valid0 = data.get("valid0")
        valid1 = data.get("valid1")
        enc0, bn0 = self.encode_keypoint(
            params, self._norm_kpts(data, 0), data["scores0"], valid0, train, axis_name)
        enc1, bn1 = self.encode_keypoint(
            params, self._norm_kpts(data, 1), data["scores1"], valid1, train, axis_name)
        return desc0 + enc0, desc1 + enc1, valid0, valid1

    def produce_matches(self, params, data, p: float = 0.2, only_last: bool = False, **_):
        """Full forward -> per-iteration (or last) matches (reference gm.py:145-247).

        Returns dict with lists 'scores', 'indices0', 'mscores0' (per collected
        iteration, i.e. per cross layer)."""
        desc0, desc1, valid0, valid1 = self._encode_inputs(params, data)

        all_desc0, all_desc1 = [], []
        state = self.init_state()
        for i in range(len(params["gnn"])):
            desc0, desc1, state = self.forward_one_layer(
                params, desc0, desc1, i, state, valid0, valid1)
            if i % 2 == 1:  # after each cross layer (reference layers.py:176-179)
                all_desc0.append(desc0)
                all_desc1.append(desc1)

        out_scores, out_idx0, out_ms0 = [], [], []
        layer_ids = [len(all_desc0) - 1] if only_last else range(len(all_desc0))
        for li in layer_ids:
            dist = self.compute_distance(params, all_desc0[li], all_desc1[li], layer_id=li)
            score = self.compute_score(params, dist, valid0, valid1)
            idx0, idx1, ms0, ms1 = self.compute_matches(score, p=p, valid0=valid0, valid1=valid1)
            out_scores.append(score)
            out_idx0.append(idx0)
            out_ms0.append(ms0)
        return {"scores": out_scores, "indices0": out_idx0, "mscores0": out_ms0}

    def forward_train(self, params, data, train: bool = True, axis_name=None):
        """Training forward: per-iteration supervision (reference gm.py:84-143).
        Returns the loss dict from impx.models.loss.graph_loss, averaged over
        all nI iterations (losses are computed per iteration and meaned,
        mirroring the reference's batch-dim stacking)."""
        from impx.models.loss import (geo_loss, graph_loss, matching_accuracy,
                                      maybe_epipolar_matrix)

        if self.config.train_supervision != "all":
            # implemented on the scan fast path only; falling through would
            # silently train the per-iteration objective the user configured
            # away from
            raise ValueError(
                "train_supervision='last' requires the scan fast path "
                "(DGNNS with attn_impl='pallas', norm_fn='in')")
        desc0, desc1, valid0, valid1 = self._encode_inputs(params, data, train, axis_name)
        gt = data["matching_mask"]
        epi = (maybe_epipolar_matrix(data, self.config.geo_clamp)
               if self.config.with_geo else None)

        state = self.init_state()
        total = None
        n_it = 0
        last_score = None
        last_idx0 = None
        geo_total = jnp.zeros(())
        for i in range(len(params["gnn"])):
            desc0, desc1, state = self.forward_one_layer(
                params, desc0, desc1, i, state, valid0, valid1)
            if i % 2 == 1:
                li = i // 2
                dist = self.compute_distance(params, desc0, desc1, layer_id=li)
                score = self.compute_score(params, dist, valid0, valid1)
                terms = graph_loss(score, gt, scores_are_log=self.scores_are_log)
                total = terms if total is None else jax.tree.map(jnp.add, total, terms)
                if epi is not None:
                    prob = jnp.exp(score) if self.scores_are_log else score
                    geo_total = geo_total + geo_loss(prob, epi, valid0, valid1)
                n_it += 1
                last_score = score
        total = jax.tree.map(lambda x: x / n_it, total)
        geo_total = geo_total / n_it
        matching_loss = total["corr"] + total["incorr"] + total["neg"]
        loss = matching_loss
        if epi is not None:
            loss = loss + self.config.geo_weight * geo_total

        idx0, idx1, ms0, ms1 = self.compute_matches(
            last_score, p=self.config.match_threshold, valid0=valid0, valid1=valid1)
        acc = matching_accuracy(idx0, gt)
        return {
            "loss": loss,
            "matching_loss": matching_loss,
            "matching_loss_corr": total["corr"],
            "matching_loss_incorr": total["incorr"],
            "matching_loss_neg": total["neg"],
            "geo_loss": geo_total,
            "matching_scores0": ms0,
            "matches0": idx0,
            **acc,
        }

    def produce_matches_test(self, params, data, p: float = 0.2, only_last: bool = False, **kw):
        """API alias (reference gm.py:249-250)."""
        return self.produce_matches(params, data, p=p, only_last=only_last, **kw)

    def __call__(self, params, data, mode: int = 0, training: bool = False):
        """Reference forward dispatch (gm.py:252-258): training -> forward_train,
        else mode 0 -> produce_matches, mode 1 -> run."""
        if training:
            return self.forward_train(params, data)
        if mode == 0:
            return self.produce_matches(params, data)
        return self.run(params, data)

    def run(self, params, data):
        """SGMNet-style eval API (reference gm.py:322-364): kpts already
        normalized; returns the full last-iteration score matrix 'p'."""
        feed = {
            "descriptors0": data["desc1"],
            "descriptors1": data["desc2"],
            "norm_keypoints0": data["x1"][..., :2],
            "norm_keypoints1": data["x2"][..., :2],
            "scores0": data["x1"][..., -1],
            "scores1": data["x2"][..., -1],
            "valid0": data.get("valid0"),
            "valid1": data.get("valid1"),
        }
        out = self.produce_matches(params, feed, p=self.config.match_threshold, only_last=True)
        return {"p": out["scores"][-1], "indices0": out["indices0"], "mscores0": out["mscores0"]}
