"""AdaGMN — the "EIMP" matcher: DGNNS + adaptive keypoint pooling.

Mirrors reference nets/adgm.py. The reference pools by gathering surviving
keypoint indices per batch element in a Python loop (adgm.py:190, :440) and
building dense attention masks. Here pooling is a pure masked computation:
a boolean `keep` mask per image shrinks monotonically; attention, Sinkhorn and
match extraction all consume the mask, so shapes stay static for XLA while the
math matches the compacted reference exactly (see impx/ops/sinkhorn.py).

Pooling rule (reference adgm.py:463-506): on updating iterations, keep
keypoints whose assignment-matrix row/col mass >= mscore_th, plus every
keypoint whose attention mass (self and cross, summed over heads+queries and
normalized) is >= the median attention mass of the score-surviving set; never
pool below n_min_tokens.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from impx.models.dgnns import DGNNS
from impx.models.loss import graph_loss, matching_accuracy


def masked_median(values: jax.Array, mask: jax.Array) -> jax.Array:
    """Lower median (torch.median semantics) of values[mask], per batch row.

    values, mask: [B, N]. Rows with empty mask return +inf (no keypoint can be
    >= it, which matches the reference's skip-on-empty behavior)."""
    big = jnp.asarray(jnp.inf, values.dtype)
    filled = jnp.where(mask, values, big)
    sorted_vals = jnp.sort(filled, axis=1)
    count = jnp.sum(mask, axis=1)
    k = jnp.clip((count - 1) // 2, 0, values.shape[1] - 1)
    return jnp.take_along_axis(sorted_vals, k[:, None], axis=1)[:, 0]


def _key_attention_mass(prob: jax.Array, query_mask: jax.Array | None) -> jax.Array:
    """Sum attention prob over heads and (valid) queries -> per-key mass,
    normalized to sum 1 (reference adgm.py:424-432)."""
    if query_mask is None:
        mass = jnp.sum(prob, axis=(1, 2))
    else:
        mass = jnp.einsum("bhqk,bq->bk", prob, query_mask.astype(prob.dtype))
    return mass / (jnp.sum(mass, axis=1, keepdims=True) + 1e-15)


class AdaGMN(DGNNS):
    def pool_masks(
        self,
        pred_score: jax.Array,
        prob00: jax.Array,
        prob01: jax.Array,
        prob11: jax.Array,
        prob10: jax.Array,
        keep0: jax.Array,
        keep1: jax.Array,
        mscore_th: float = 0.1,
        uncertainty_ratio: float = 1.0,
        n_min_tokens: int | None = None,
        qmask0: jax.Array | None = None,
        qmask1: jax.Array | None = None,
    ):
        """One pooling step; returns (new_keep0, new_keep1).

        Functional equivalent of reference adgm.py:463-506 (produce_matches
        update) and adgm.py:552-605 (`pool`). prob01/prob10 conventions:
        prob01 has queries=image1, keys=image0; prob10 queries=0, keys=1.

        qmask0/qmask1: which QUERIES contribute to the attention-mass sums.
        The reference's full-size paths sum over ALL real queries including
        already-discarded ones (adgm.py:424-427 sums the whole prob tensor),
        so the masked `_iterate` passes the padding-validity masks here; the
        sliced paths (reference matching.py:166-174) have only kept tokens
        in the tensor, which the default (keep) reproduces.
        """
        if n_min_tokens is None:
            n_min_tokens = self.config.n_min_tokens
        th = mscore_th * uncertainty_ratio
        if qmask0 is None:
            qmask0 = keep0
        if qmask1 is None:
            qmask1 = keep1

        if isinstance(prob00, dict):  # fused path: {'q','k'} states, not probs
            norm00, norm01, norm11, norm10 = self._masses_from_qk(
                prob00, prob01, prob11, prob10, keep0, keep1, qmask0, qmask1)
        else:
            norm00 = _key_attention_mass(prob00, qmask0)  # keys: image0
            norm01 = _key_attention_mass(prob01, qmask1)  # keys: image0
            norm11 = _key_attention_mass(prob11, qmask1)  # keys: image1
            norm10 = _key_attention_mass(prob10, qmask0)  # keys: image1

        return self._pool_from_norm(pred_score, norm00, norm01, norm11, norm10,
                                    keep0, keep1, th, n_min_tokens)

    def _pool_from_norm(self, pred_score, norm00, norm01, norm11, norm10,
                        keep0, keep1, th, n_min_tokens):
        """Core pooling rule given the normalized key attention masses."""
        inner = pred_score[:, :-1, :-1]
        return self._pool_from_masses(
            jnp.sum(inner, axis=2), jnp.sum(inner, axis=1),
            norm00, norm01, norm11, norm10, keep0, keep1, th, n_min_tokens)

    def _pool_from_masses(self, rowmass, colmass, norm00, norm01, norm11,
                          norm10, keep0, keep1, th, n_min_tokens):
        """Pooling rule from interior row/col mass of the assignment matrix
        ([B,N]/[B,M]) — lets the fused Sinkhorn kernel feed pooling without
        materializing the plan (reference adgm.py:246-265 semantics)."""
        pids0 = (rowmass >= th) & keep0
        pids1 = (colmass >= th) & keep1

        def side(keep, pids, norm_a, norm_b):
            md_a = masked_median(norm_a, pids)[:, None]
            md_b = masked_median(norm_b, pids)[:, None]
            aug = (norm_a >= md_a) | (norm_b >= md_b)
            new_keep = keep & (pids | aug)
            count = jnp.sum(keep, axis=1, keepdims=True)
            do_update = (count > n_min_tokens) if n_min_tokens > 0 else jnp.ones_like(count, bool)
            has_pids = jnp.any(pids, axis=1, keepdims=True)
            return jnp.where(do_update & has_pids, new_keep, keep)

        new_keep0 = side(keep0, pids0, norm00, norm01)
        new_keep1 = side(keep1, pids1, norm11, norm10)
        return new_keep0, new_keep1

    def _masses_from_qk(self, s00, s01, s11, s10, keep0, keep1,
                        qmask0=None, qmask1=None):
        """Pooling statistics from stored q/k projections via the Pallas
        column-mass kernel — same values as summing the prob tensors
        (reference adgm.py:424-432) without materializing them."""
        from impx.ops.attention import _interpret
        from impx.ops.pallas.attention import attention_key_mass

        interp = _interpret()
        if qmask0 is None:
            qmask0 = keep0
        if qmask1 is None:
            qmask1 = keep1

        def norm(mass):
            return mass / (jnp.sum(mass, axis=1, keepdims=True) + 1e-15)

        # s00: queries=0, keys=0; s01: queries=1, keys=0;
        # s11: queries=1, keys=1; s10: queries=0, keys=1
        m00 = attention_key_mass(s00["q"], s00["k"], keep0, qmask0, interpret=interp)
        m01 = attention_key_mass(s01["q"], s01["k"], keep0, qmask1, interpret=interp)
        m11 = attention_key_mass(s11["q"], s11["k"], keep1, qmask1, interpret=interp)
        m10 = attention_key_mass(s10["q"], s10["k"], keep1, qmask0, interpret=interp)
        return norm(m00), norm(m01), norm(m11), norm(m10)

    def pool(self, pred_score, prob00, prob01, prob11, prob10,
             mscore_th=0.1, uncertainty_ratio=1.0, n_min_tokens=256,
             keep0=None, keep1=None):
        """Standalone single-pair pooling (reference adgm.py:552-605 API)."""
        b, n0p, n1p = pred_score.shape
        if keep0 is None:
            keep0 = jnp.ones((b, n0p - 1), bool)
        if keep1 is None:
            keep1 = jnp.ones((b, n1p - 1), bool)
        return self.pool_masks(pred_score, prob00, prob01, prob11, prob10,
                               keep0, keep1, mscore_th, uncertainty_ratio, n_min_tokens)

    # ------------------------------------------------------------------ forwards
    def _iterate(self, params, data, p, mscore_th, uncertainty_ratio, train=False,
                 axis_name=None, gt=None):
        """Shared eval/train iteration loop. Yields nothing; returns
        (per-iteration outputs, optional loss terms)."""
        cfg = self.config
        desc0, desc1, valid0, valid1 = self._encode_inputs(params, data, train, axis_name)
        b, n0 = desc0.shape[:2]
        n1 = desc1.shape[1]
        keep0 = valid0 if valid0 is not None else jnp.ones((b, n0), bool)
        keep1 = valid1 if valid1 is not None else jnp.ones((b, n1), bool)
        # all-real-token masks (None valid => everything): the query-side
        # masks stay FIXED at this as pooling shrinks keep0/keep1
        full0, full1 = keep0, keep1

        sharing = cfg.sharing_layers(True)
        prob00 = prob01 = prob10 = prob11 = None
        all_idx0, all_ms0, all_scores = [], [], []
        total = None
        epi = None
        if gt is not None and cfg.with_geo:
            from impx.models.loss import maybe_epipolar_matrix
            epi = maybe_epipolar_matrix(data, cfg.geo_clamp)

        for ni in range(cfg.n_layers):
            # self attention (reference adgm.py:374-386). NOTE the reference
            # keeps the FULL desc tensors throughout: discarded keypoints are
            # masked out as attention KEYS only, but are still updated as
            # queries and still contribute to the MLP's InstanceNorm
            # statistics — so query_mask (the MLP-norm mask) is the padding
            # validity, NOT the keep mask.
            layer = params["gnn"][ni * 2]
            delta0, prob00, _ = self._apply_layer(
                layer, desc0, desc0, prob=prob00, key_mask=keep0, query_mask=full0,
                train=train, axis_name=axis_name)
            delta1, prob11, _ = self._apply_layer(
                layer, desc1, desc1, prob=prob11, key_mask=keep1, query_mask=full1,
                train=train, axis_name=axis_name)
            desc0 = desc0 + delta0
            desc1 = desc1 + delta1

            # cross attention (reference adgm.py:388-399)
            layer = params["gnn"][ni * 2 + 1]
            delta0, prob10, _ = self._apply_layer(
                layer, desc0, desc1, prob=prob10, key_mask=keep1, query_mask=full0,
                train=train, axis_name=axis_name)
            delta1, prob01, _ = self._apply_layer(
                layer, desc1, desc0, prob=prob01, key_mask=keep0, query_mask=full1,
                train=train, axis_name=axis_name)
            desc0 = desc0 + delta0
            desc1 = desc1 + delta1

            dist = self.compute_distance(params, desc0, desc1, layer_id=ni)
            pred_score = self.compute_score(params, dist, keep0, keep1)
            idx0, idx1, ms0, ms1 = self.compute_matches(
                pred_score, p=p, valid0=keep0, valid1=keep1)
            all_idx0.append(idx0)
            all_ms0.append(ms0)
            all_scores.append(pred_score)

            if gt is not None:
                if ni < cfg.first_it_to_update:
                    terms = graph_loss(pred_score, gt)
                else:
                    terms = graph_loss(pred_score, _masked_gt(gt, keep0, keep1))
                if epi is not None:
                    from impx.models.loss import geo_loss
                    terms["geo"] = geo_loss(pred_score, epi, keep0, keep1)
                total = terms if total is None else jax.tree.map(jnp.add, total, terms)

            perform_updating = sharing[2 * ni] and ni >= cfg.first_it_to_update
            if perform_updating:
                pooled0, pooled1 = self.pool_masks(
                    pred_score, prob00, prob01, prob11, prob10, keep0, keep1,
                    mscore_th=mscore_th, uncertainty_ratio=uncertainty_ratio,
                    qmask0=full0, qmask1=full1)
                keep0, keep1 = (jax.lax.stop_gradient(pooled0),
                                jax.lax.stop_gradient(pooled1))
        return all_scores, all_idx0, all_ms0, total, (keep0, keep1)

    def produce_matches(self, params, data, p: float = 0.2, mscore_th: float = 0.1,
                        uncertainty_ratio: float = 1.0, only_last: bool = False,
                        with_scores: bool = True, **_):
        """Reference adgm.py:327-526 (eval path)."""
        if (self.config.attn_impl == "pallas" and self.config.norm_fn == "in"
                and not self.config.log_ot):
            # (the EIMP scan body's pooling masses come from the NON-log
            # fused Sinkhorn kernel; log_ot EIMP uses the masked XLA path)
            from impx.models.fast import (
                forward_scan_eimp, forward_scan_eimp_compact, stack_params)

            stacked = stack_params(params, self.config)
            fwd = (forward_scan_eimp_compact if self.config.compaction
                   else forward_scan_eimp)
            return fwd(self, stacked, data, p=p, mscore_th=mscore_th,
                       uncertainty_ratio=uncertainty_ratio,
                       only_last=only_last, with_scores=with_scores)
        all_scores, all_idx0, all_ms0, _, keeps = self._iterate(
            params, data, p, mscore_th, uncertainty_ratio)
        if only_last:
            return {"scores": all_scores[-1:], "indices0": all_idx0[-1:],
                    "mscores0": all_ms0[-1:], "keep0": keeps[0], "keep1": keeps[1]}
        return {"scores": all_scores[-1:], "indices0": all_idx0, "mscores0": all_ms0,
                "keep0": keeps[0], "keep1": keeps[1]}

    def forward_train(self, params, data, train: bool = True, axis_name=None):
        """Reference adgm.py:49-325: per-iteration loss with the ground-truth
        mask restricted to surviving keypoints after pooling. Routes through
        the scan fast path (fused kernels, one compiled body, remat per
        cfg.train_remat) under the same conditions as produce_matches."""
        if self.config.train_supervision != "all":
            raise ValueError(
                "train_supervision='last' is not defined for the EIMP "
                "trainer (pooling decisions depend on per-iteration scores)")
        if (self.config.attn_impl == "pallas" and self.config.norm_fn == "in"
                and not self.config.log_ot):
            from impx.models.fast import (forward_train_scan_eimp,
                                          forward_train_scan_eimp_compact,
                                          stack_params)

            stacked = stack_params(params, self.config)
            if self.config.train_compaction:
                return forward_train_scan_eimp_compact(self, stacked, data)
            return forward_train_scan_eimp(self, stacked, data)
        if self.config.train_compaction:
            # a compaction schedule only exists on the scan fast path; falling
            # through silently would train the full-size masked objective the
            # user explicitly configured away from
            raise ValueError(
                "cfg.train_compaction requires attn_impl='pallas', "
                "norm_fn='in' and log_ot=False (got attn_impl="
                f"{self.config.attn_impl!r}, norm_fn={self.config.norm_fn!r}, "
                f"log_ot={self.config.log_ot})")
        gt = data["matching_mask"]
        all_scores, all_idx0, all_ms0, total, _ = self._iterate(
            params, data, p=0.2, mscore_th=0.1, uncertainty_ratio=1.0,
            train=train, axis_name=axis_name, gt=gt)
        n_it = self.config.n_layers
        total = jax.tree.map(lambda x: x / n_it, total)
        matching_loss = total["corr"] + total["incorr"] + total["neg"]
        loss = matching_loss
        if "geo" in total:
            loss = loss + self.config.geo_weight * total["geo"]

        accs = [matching_accuracy(idx0, gt) for idx0 in all_idx0]
        acc = jax.tree.map(lambda *xs: sum(xs) / len(xs), *accs)
        return {
            "loss": loss,
            "matching_loss": matching_loss,
            "matching_loss_corr": total["corr"],
            "matching_loss_incorr": total["incorr"],
            "matching_loss_neg": total["neg"],
            "geo_loss": total.get("geo", jnp.zeros(())),
            "matching_scores0": all_ms0[-1],
            "matches0": all_idx0[-1],
            **acc,
        }


def _masked_gt(gt, keep0, keep1):
    """Restrict the GT assignment mask to surviving keypoints and re-derive the
    dustbin rows/cols (a kept point whose GT partner was pooled away becomes
    unmatched) — reference adgm.py:219-226."""
    gtf = gt.astype(jnp.float32)
    k0 = keep0.astype(jnp.float32)
    k1 = keep1.astype(jnp.float32)
    inner = gtf[:, :-1, :-1] * k0[:, :, None] * k1[:, None, :]
    row_dust = k0 * (1.0 - jnp.max(inner, axis=2))
    col_dust = k1 * (1.0 - jnp.max(inner, axis=1))
    top = jnp.concatenate([inner, row_dust[:, :, None]], axis=2)
    bottom = jnp.concatenate([col_dust, jnp.zeros_like(col_dust[:, :1])], axis=1)
    return jnp.concatenate([top, bottom[:, None, :]], axis=1)
