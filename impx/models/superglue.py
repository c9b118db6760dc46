"""SuperGlue baseline matcher (vendored in the reference as nets/superglue.py).

Differences from GM (reference superglue.py:216-437): a single final
projection shared across iterations (not per-iteration), the numerically
stable log-domain optimal transport head (superglue.py:180-209 — our masked
port lives in impx/ops/sinkhorn.py:log_optimal_transport), and match
extraction exponentiates the log-scores (superglue.py:424-437).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from impx.models.config import MatcherConfig
from impx.models.gm import GM
from impx.ops.mlp import dense_apply, dense_init
from impx.ops.sinkhorn import log_optimal_transport


class SuperGlue(GM):
    sharing = False

    @property
    def scores_are_log(self) -> bool:
        return True  # log-domain OT head, unconditionally (superglue.py:180-209)

    def init(self, key: jax.Array) -> dict:
        params = super().init(key)
        # single shared projection (reference superglue.py:263-266)
        params["final_proj"] = [params["final_proj"][0]]
        return params

    def compute_distance(self, params, desc0, desc1, layer_id: int = -1):
        p = params["final_proj"][0]
        mdesc0 = dense_apply(p, desc0)
        mdesc1 = dense_apply(p, desc1)
        dist = jnp.einsum("bnd,bmd->bnm", mdesc0, mdesc1)
        return dist / (self.config.descriptor_dim ** 0.5)

    def compute_score(self, params, dist, valid0=None, valid1=None):
        if self.config.attn_impl == "pallas":
            # fused iterated-logsumexp kernel: u/v in VMEM, remat VJP;
            # log-plan materialized in one XLA pass
            from impx.ops.pallas.log_sinkhorn import log_optimal_transport_fused
            from impx.models.fast import _interpret

            return log_optimal_transport_fused(
                dist, params["bin_score"], self.config.sinkhorn_iterations,
                valid0, valid1, 128, _interpret())
        return log_optimal_transport(
            dist, params["bin_score"], self.config.sinkhorn_iterations, valid0, valid1)

    # compute_matches inherited: GM exponentiates when scores_are_log
    # (reference superglue.py:424-437)


def convert_superglue_matcher(state, config: MatcherConfig) -> dict:
    """Torch SuperGlue state_dict -> params (single final_proj)."""
    from impx.tools.convert_torch import _conv1d, _mlp

    params = {
        "kenc": _mlp(state, "kenc.encoder", len(config.keypoint_encoder) + 1, "bn"),
        "final_proj": [_conv1d(state, "final_proj")],
        "bin_score": jnp.asarray(float(state["bin_score"])),
        "gnn": [],
    }
    for i in range(2 * config.n_layers):
        prefix = f"gnn.layers.{i}"
        params["gnn"].append({
            "attn": {
                "q": _conv1d(state, f"{prefix}.attn.proj.0"),
                "k": _conv1d(state, f"{prefix}.attn.proj.1"),
                "v": _conv1d(state, f"{prefix}.attn.proj.2"),
                "merge": _conv1d(state, f"{prefix}.attn.merge"),
            },
            "mlp": _mlp(state, f"{prefix}.mlp", 2, "bn"),
        })
    return params
