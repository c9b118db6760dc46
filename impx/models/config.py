"""Typed matcher configuration.

One config type serves GM / DGNNS (IMP) / AdaGMN (EIMP); defaults mirror
reference nets/gm.py:30-44 (`GM.default_config`) and the eval-time settings in
eval/eval_imp.py:259-270.
"""
from __future__ import annotations

import dataclasses
from typing import Sequence


@dataclasses.dataclass(frozen=True)
class MatcherConfig:
    descriptor_dim: int = 256
    keypoint_encoder: Sequence[int] = (32, 64, 128, 256)
    n_layers: int = 9  # self+cross iterations
    num_heads: int = 4
    sinkhorn_iterations: int = 20
    match_threshold: float = 0.2
    with_sinkhorn: bool = True
    ac_fn: str = "relu"
    norm_fn: str = "bn"
    n_min_tokens: int = 256
    # EIMP
    first_it_to_update: int = 2
    # EIMP bucketed compaction (scan fast path): ((iteration, bucket), ...) —
    # before `iteration`, physically gather both images' keypoint sets into
    # `bucket` slots (survivor masks + global-id tracking; reference
    # adgm.py:212-215 gids semantics). Empty = mask-only pooling (no FLOP
    # savings). Shrinks the O(N^2) attention/Sinkhorn cost like the
    # reference's dynamic slicing, at XLA-static shapes.
    compaction: tuple = ()
    # EIMP bucketed compaction for TRAINING (forward_train_scan_eimp_compact):
    # same ((iteration, bucket), ...) schedule applied to the training scan —
    # the GT assignment mask is gathered along with the keypoints, the loss
    # runs on the compacted score matrix, and matches/accuracy are scattered
    # back to original indexing. Physically dropping tokens is the SLICED
    # semantics (like the compacted eval path / the reference's
    # eval/matching.py:166-174), a deliberate departure from the reference's
    # masked training (discarded tokens stay as queries + in IN statistics)
    # in exchange for real FLOP savings; overflow (survivors beyond the
    # bucket) is counted and reported in the step metrics. Empty = the
    # reference-semantics masked trainer.
    train_compaction: tuple = ()
    # geometry-supervised (_geo) training: add a pose-consistency loss term —
    # assignment probabilities weighted by the clamped epipolar error under
    # the gt pose (reference nets/loss.py:20 `with_pose` hook; trains the
    # IMP_geo/EIMP_geo weight-table variants of eval/eval_imp.py:275/316)
    with_geo: bool = False
    geo_weight: float = 50.0   # epi errors are ~1e-3..5e-2 in normalized coords
    geo_clamp: float = 0.05    # 10x the eval protocol's 0.005 inlier threshold
    # score head: False = the reference's non-log Sinkhorn
    # (nets/layers.py:27-46, IMP semantics); True = the numerically-stable
    # log-domain optimal transport (nets/superglue.py:180-209) — the
    # preferred head for bf16 training, fused as an iterated-logsumexp
    # Pallas kernel when attn_impl='pallas'
    # (impx/ops/pallas/log_sinkhorn.py)
    log_ot: bool = False
    # compute dtype for the attention einsums ('float32' | 'bfloat16')
    compute_dtype: str = "float32"
    # attention implementation: 'xla' (materializes probs; differentiable) or
    # 'pallas' (fused kernel, no HBM prob traffic; inference paths)
    attn_impl: str = "xla"
    # rematerialization policy for the training layer scan
    # (forward_train_scan): 'full' recomputes the whole body in the backward
    # pass (minimum HBM; ~1.3x forward recompute), 'dots' saves batched-dot
    # outputs (jax.checkpoint_policies.dots_saveable — skips re-running the
    # MXU work at the cost of holding projection/Sinkhorn intermediates),
    # 'attn' saves only the fused-attention kernel outputs (skips the
    # priciest VPU recompute, everything else rematerialized), 'attn_head'
    # additionally lifts the score head + loss OUT of the remat region so the
    # Sinkhorn custom-VJP residuals are stored instead of replayed,
    # 'attn_dots' saves both the attention outputs AND all MXU outputs,
    # 'none' stores everything (only viable at small batch/N)
    train_remat: str = "full"
    # training fast path: run each attentional-propagation layer as ONE
    # custom-VJP op (impx/models/fast.py `_make_fused_layer`) that stores
    # exactly (x, q_used, k_used, attention out, row lse) and whose backward
    # (a) never replays the forward, (b) rebuilds softmax probs in one exp
    # pass from the saved lse, (c) runs every backward matmul in the
    # activation stream's dtype. Supersedes train_remat for the layer part
    # (the score head + loss stay under full remat). Needs
    # attn_impl='pallas' + norm_fn='in'.
    train_fused: bool = False
    # which iterations the training loss supervises: 'all' = every self/cross
    # iteration (the reference objective — per-iteration Sinkhorn + NLL,
    # gms.py:48-137 stacks all nI iterations), 'last' = only the final
    # iteration (SuperGlue-style, superglue.py:352-416 — one score head per
    # step instead of n_layers; a cheaper objective AND the exact ablation
    # that isolates the per-iteration score-head chain's cost)
    train_supervision: str = "all"
    # q-block size for the fused attention kernel (None = kernel default 256
    # on the eval paths; the TRAINING scan picks the full keypoint count when
    # N <= 1024 — measured +3% at the published training config: a single
    # q-block removes the backward kernel's dk/dv accumulation sweeps)
    attn_block_q: int | None = None

    @property
    def gnn_layers(self) -> list[str]:
        return ["self", "cross"] * self.n_layers

    def sharing_layers(self, share: bool) -> list[bool]:
        """DGNNS/AdaGMN pattern (reference nets/gms.py:17, nets/adgm.py:18):
        first two iterations fully recompute, then alternate
        (recompute, recompute, share, share) per layer."""
        if not share:
            return [False] * (2 * self.n_layers)
        pattern = [False, False] * 2 + [False, False, True, True] * 21
        return pattern[: 2 * self.n_layers]

    @classmethod
    def eval_config(cls, feature: str = "spp", n_layers: int = 15) -> "MatcherConfig":
        """The published eval configuration (reference eval/eval_imp.py:259-270)."""
        return cls(
            descriptor_dim=256 if feature == "spp" else 128,
            n_layers=n_layers,
            sinkhorn_iterations=20,
            match_threshold=0.2,
            ac_fn="relu",
            norm_fn="in",
            n_min_tokens=256,
        )
