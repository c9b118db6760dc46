"""Matching losses on the dustbin-augmented assignment matrix.

Mirrors reference nets/loss.py (`GraphLoss`): mean NLL over ground-truth
correspondences, NLL of the dustbin row/col for unmatched keypoints, optional
hard-negative margin loss. Reference uses boolean-mask indexing (dynamic
shapes); here everything is masked sums — identical values, static shapes.
"""
from __future__ import annotations

import jax.numpy as jnp

LOG_EPS = 1e-8  # reference loss.py:75


def graph_loss(pred_scores, gt_matching_mask, with_hard_negative: bool = False,
               neg_margin: float = 0.1, scores_are_log: bool = False):
    """Returns dict(corr=, incorr=, neg=) of scalar losses
    (reference loss.py:74-104 `compute_matching_loss_batch`).

    scores_are_log: set for the log-domain OT head (superglue.py:180-209 /
    impx log_optimal_transport) — the NLL then uses the log-plan directly,
    avoiding the exp->log underflow round-trip that defeats the log head's
    stability in bf16."""
    if scores_are_log:
        log_p = pred_scores
        if with_hard_negative:
            pred_scores = jnp.exp(pred_scores)
    else:
        log_p = jnp.log(jnp.abs(pred_scores) + LOG_EPS)
    gt = gt_matching_mask.astype(pred_scores.dtype)

    num_corr = jnp.sum(gt[:, :-1, :-1], axis=(1, 2))
    num_corr = jnp.where(num_corr == 0, 1.0, num_corr)
    loss_corr = jnp.sum(log_p[:, :-1, :-1] * gt[:, :-1, :-1], axis=(1, 2)) / num_corr
    loss_corr = -jnp.mean(loss_corr)

    num_incorr1 = jnp.sum(gt[:, :, -1], axis=1)
    num_incorr2 = jnp.sum(gt[:, -1, :], axis=1)
    l1 = jnp.sum(log_p[:, :, -1] * gt[:, :, -1], axis=1)
    l2 = jnp.sum(log_p[:, -1, :] * gt[:, -1, :], axis=1)
    m1 = num_incorr1 > 0
    m2 = num_incorr2 > 0
    mean1 = jnp.sum(jnp.where(m1, l1 / jnp.where(m1, num_incorr1, 1.0), 0.0)) / jnp.maximum(
        jnp.sum(m1), 1)
    mean2 = jnp.sum(jnp.where(m2, l2 / jnp.where(m2, num_incorr2, 1.0), 0.0)) / jnp.maximum(
        jnp.sum(m2), 1)
    any1 = jnp.any(m1)
    loss_incorr = jnp.where(any1, -(mean1 + mean2) / 2.0, 0.0)

    if with_hard_negative:
        loss_neg = hard_negative_loss(pred_scores, gt, neg_margin)
    else:
        loss_neg = jnp.zeros((), pred_scores.dtype)
    return {"corr": loss_corr, "incorr": loss_incorr, "neg": loss_neg}


def hard_negative_loss(pred_scores, gt, neg_margin: float = 0.1):
    """Margin between best true and best false assignment per row/col
    (reference loss.py:106-123)."""
    gt_inv = 1.0 - gt
    pos_row = jnp.max(pred_scores[:, :-1, :] * gt[:, :-1, :], axis=2)
    pos_col = jnp.max(pred_scores[:, :, :-1] * gt[:, :, :-1], axis=1)
    neg_row = jnp.max(pred_scores[:, :-1, :] * gt_inv[:, :-1, :], axis=2)
    neg_col = jnp.max(pred_scores[:, :, :-1] * gt_inv[:, :, :-1], axis=1)
    loss_neg_row = -jnp.mean(jnp.minimum(pos_row - neg_row - neg_margin, 0.0))
    loss_neg_col = -jnp.mean(jnp.minimum(pos_col - neg_col - neg_margin, 0.0))
    return (loss_neg_row + loss_neg_col) / 2.0


def epipolar_loss(pred_scores, epipolar_error):
    """Score-weighted epipolar error (reference loss.py:125-126 hook)."""
    return jnp.mean(pred_scores * epipolar_error)


def geo_loss(pred_scores, epi, valid0=None, valid1=None):
    """Pose-consistency loss: the mean epipolar error of the *assigned
    probability mass* — sum(p·epi) / sum(p) over valid non-dustbin cells.

    This is the geometry supervision behind the reference's `_geo` weight
    variants (eval/eval_imp.py:275/316 weight tables; `with_pose` config hook
    nets/loss.py:20 + `compute_epipolar_loss_batch` nets/loss.py:125-126 —
    declared but never wired in the reference). The IMP paper trains these by
    penalizing probability mass on geometrically inconsistent pairs under the
    ground-truth pose; the matching NLL keeps mass off the dustbin, this term
    pushes whatever mass remains onto epipolar-consistent pairs.

    Mass normalization (not cell-count normalization, which the reference's
    dormant hook uses) keeps the term in [0, clamp] regardless of N and of
    how much mass the dustbin holds — the value reads directly as "average
    epipolar error of the predicted assignment".

    pred_scores [B, N+1, M+1]; epi [B, N, M] (pre-clamped by the caller);
    valid masks broadcast over padded cells."""
    p = pred_scores[:, :-1, :-1]
    if valid0 is not None:
        pairmask = (valid0[:, :, None] & valid1[:, None, :]).astype(p.dtype)
        p = p * pairmask
    mass = jnp.sum(p, axis=(1, 2))
    return jnp.mean(jnp.sum(p * epi, axis=(1, 2)) / jnp.maximum(mass, 1e-6))


def maybe_epipolar_matrix(data, clamp: float):
    """Build the clamped all-pairs epipolar-error matrix [B, N, M] from a
    training batch, or return None when the batch lacks the geometric keys
    (pixel keypoints + intrinsics + gt essential matrix — the megadepth dump
    layout, reference dataset/megadepth.py:218-226)."""
    needed = ("keypoints0", "keypoints1", "intrinsics0", "intrinsics1", "gt_E")
    if not all(k in data for k in needed):
        return None
    from impx.geometry.epipolar import (normalize_by_intrinsics,
                                        pairwise_epipolar_distance)

    x0n = normalize_by_intrinsics(data["keypoints0"], data["intrinsics0"])
    x1n = normalize_by_intrinsics(data["keypoints1"], data["intrinsics1"])
    epi = pairwise_epipolar_distance(x0n, x1n, data["gt_E"])
    return jnp.minimum(epi, clamp)


def matching_accuracy(indices0, gt_matching_mask, n_iters: int = 1):
    """Correct/incorrect match counters (reference gm.py:207-214, loss.py:47-53).
    indices0: [B, N] predicted matches (-1 unmatched); gt mask [B, N+1, M+1]."""
    b = indices0.shape[0]
    gt_matches = jnp.argmax(gt_matching_mask[:, :-1, :], axis=-1)
    dust = gt_matching_mask.shape[-1] - 1
    denom = b * n_iters
    acc_corr = jnp.sum((indices0 == gt_matches) & (indices0 != -1) & (gt_matches < dust)) / denom
    acc_incorr = jnp.sum((indices0 == -1) & (gt_matches == dust)) / denom
    total_corr = jnp.sum(gt_matches < dust) / denom
    total_incorr = jnp.sum(gt_matches == dust) / denom
    return {
        "acc_corr": acc_corr,
        "acc_incorr": acc_incorr,
        "total_acc_corr": total_corr,
        "total_acc_incorr": total_incorr,
    }
