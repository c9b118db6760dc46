"""DGNNS — the "IMP" matcher: GM with SAGNN attention sharing.

Mirrors reference nets/gms.py: identical to GM except some layers reuse the
attention probabilities of the previous layer of the same kind instead of
recomputing QK (sharing pattern in MatcherConfig.sharing_layers, reference
gms.py:17). In this functional rebuild the whole difference is the layer
stack's parameter structure + the carried prob state, so DGNNS is just GM
with `sharing = True` — produce_matches / forward_train / forward_one_layer
in gm.py already thread the shared probabilities the way
gms.py:139-258 / gms.py:48-137 do.
"""
from __future__ import annotations

import jax.numpy as jnp

from impx.models.gm import GM


class DGNNS(GM):
    sharing = True

    def produce_matches(self, params, data, p: float = 0.2, only_last: bool = False,
                        with_scores: bool = True, **kw):
        """Route the inference forward through the scan fast path when the
        fused kernels are enabled (2 kernel call sites total; see
        impx/models/fast.py) — numerically identical to the unrolled path.
        with_scores=False (fast path only) skips materializing the transport
        plan in HBM; 'scores' comes back [None]."""
        if self.config.attn_impl == "pallas" and self.config.norm_fn == "in":
            from impx.models.fast import forward_scan, stack_params

            stacked = stack_params(params, self.config)
            return forward_scan(self, stacked, data, p=p, only_last=only_last,
                                with_scores=with_scores)
        return super().produce_matches(params, data, p=p, only_last=only_last, **kw)

    def forward_train(self, params, data, train: bool = True, axis_name=None):
        """Training forward; routes through the scan fast path (fused kernels
        with custom VJP) when enabled — numerically equivalent per-iteration
        supervision (reference gms.py:48-137)."""
        if self.config.attn_impl == "pallas" and self.config.norm_fn == "in":
            from impx.models.fast import forward_train_scan, stack_params

            stacked = stack_params(params, self.config)
            return forward_train_scan(self, stacked, data)
        return super().forward_train(params, data, train=train, axis_name=axis_name)

    def pool(self, *args, **kwargs):
        """No pooling in plain IMP (reference gms.py:316-317)."""
        return None, None

    def run(self, params, data):
        """Eval API returning matched index pairs (reference gms.py:284-314).
        Note: returns fixed-shape indices0; hosts extract pairs with
        indices0 >= 0 (kept on device here for jit-friendliness)."""
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
        out = self.produce_matches(params, feed, p=self.config.match_threshold,
                                   only_last=True, with_scores=False)
        indices0 = out["indices0"][-1]
        return {"indices0": indices0, "mscores0": out["mscores0"][-1]}
