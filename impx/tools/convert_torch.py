"""PyTorch checkpoint -> impx param pytree converters.

Lets reference-trained weights (imp_spp.pth, eimp_spp.pth, superpoint_v1.pth,
reference eval/eval_imp.py:274-333 weight table) seed the TPU models, and is
the backbone of the parity test-suite (random torch weights -> converted ->
outputs compared elementwise).

Key mapping facts:
  * torch Conv1d(k=1) weight [out, in, 1] -> dense w [in, out] (transpose).
  * torch Conv2d weight [out, in, kh, kw] -> lax.conv kernel in HWIO.
  * MLP Sequentials interleave Conv1d / norm / activation, so conv module
    indices are 0, 3, 6, ... (norm_fn='in' has no parameters; 'bn' carries
    weight/bias/running stats) — reference nets/layers.py:59-77.
"""
from __future__ import annotations

from typing import Mapping

import numpy as np
import jax.numpy as jnp

from impx.models.config import MatcherConfig


def _np(t):
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t)


def _conv1d(state: Mapping, prefix: str) -> dict:
    w = _np(state[f"{prefix}.weight"])  # [out, in, 1]
    b = _np(state[f"{prefix}.bias"])
    return {"w": jnp.asarray(w[:, :, 0].T), "b": jnp.asarray(b)}


def _mlp(state: Mapping, prefix: str, n_convs: int, norm_fn: str) -> list[dict]:
    """Convert an MLP Sequential with `n_convs` Conv1d blocks."""
    blocks = []
    idx = 0
    dot = f"{prefix}." if prefix else ""
    for i in range(n_convs):
        block = _conv1d(state, f"{dot}{idx}")
        idx += 1
        if i < n_convs - 1:
            if norm_fn == "bn":
                block.update(
                    bn_scale=jnp.asarray(_np(state[f"{dot}{idx}.weight"])),
                    bn_bias=jnp.asarray(_np(state[f"{dot}{idx}.bias"])),
                    bn_mean=jnp.asarray(_np(state[f"{dot}{idx}.running_mean"])),
                    bn_var=jnp.asarray(_np(state[f"{dot}{idx}.running_var"])),
                )
            if norm_fn in ("bn", "in"):
                idx += 1  # the norm module
            idx += 1  # the activation module
        blocks.append(block)
    return blocks


def convert_matcher(state: Mapping, config: MatcherConfig, sharing: bool) -> dict:
    """Convert a GM/DGNNS/AdaGMN state_dict (see reference nets/gm.py:46-77)."""
    state = {k: v for k, v in state.items()}
    n_enc = len(config.keypoint_encoder) + 1
    params = {
        "kenc": _mlp(state, "kenc.encoder", n_enc, config.norm_fn),
        "final_proj": [
            _conv1d(state, f"final_proj.{i}") for i in range(config.n_layers)
        ],
        "bin_score": jnp.asarray(_np(state["bin_score"])),
        "gnn": [],
    }
    share = config.sharing_layers(sharing)
    for i in range(2 * config.n_layers):
        prefix = f"gnn.layers.{i}"
        mlp = _mlp(state, f"{prefix}.mlp", 2, config.norm_fn)
        if share[i]:
            layer = {
                "proj": _conv1d(state, f"{prefix}.proj"),
                "merge": _conv1d(state, f"{prefix}.merge"),
                "mlp": mlp,
            }
        else:
            layer = {
                "attn": {
                    "q": _conv1d(state, f"{prefix}.attn.proj.0"),
                    "k": _conv1d(state, f"{prefix}.attn.proj.1"),
                    "v": _conv1d(state, f"{prefix}.attn.proj.2"),
                    "merge": _conv1d(state, f"{prefix}.attn.merge"),
                },
                "mlp": mlp,
            }
        params["gnn"].append(layer)
    return params


def load_matcher_checkpoint(path: str, config: MatcherConfig, sharing: bool) -> dict:
    """Load a reference .pth checkpoint ({'model': state_dict, ...})."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    state = ckpt["model"] if "model" in ckpt else ckpt
    return convert_matcher(state, config, sharing)


def _torch_conv1d(dst: dict, prefix: str, block: Mapping) -> None:
    import torch

    w = np.asarray(block["w"])  # [in, out]
    dst[f"{prefix}.weight"] = torch.from_numpy(np.ascontiguousarray(w.T[:, :, None]))
    dst[f"{prefix}.bias"] = torch.from_numpy(np.asarray(block["b"]).copy())


def _torch_mlp(dst: dict, prefix: str, blocks, norm_fn: str) -> None:
    import torch

    idx = 0
    dot = f"{prefix}." if prefix else ""
    for i, block in enumerate(blocks):
        _torch_conv1d(dst, f"{dot}{idx}", block)
        idx += 1
        if i < len(blocks) - 1:
            if norm_fn == "bn":
                dst[f"{dot}{idx}.weight"] = torch.from_numpy(
                    np.asarray(block["bn_scale"]).copy())
                dst[f"{dot}{idx}.bias"] = torch.from_numpy(
                    np.asarray(block["bn_bias"]).copy())
                dst[f"{dot}{idx}.running_mean"] = torch.from_numpy(
                    np.asarray(block["bn_mean"]).copy())
                dst[f"{dot}{idx}.running_var"] = torch.from_numpy(
                    np.asarray(block["bn_var"]).copy())
                dst[f"{dot}{idx}.num_batches_tracked"] = torch.zeros(
                    (), dtype=torch.long)
            if norm_fn in ("bn", "in"):
                idx += 1
            idx += 1


def matcher_state_dict(params: Mapping, config: MatcherConfig,
                       sharing: bool) -> dict:
    """Inverse of convert_matcher: impx param pytree -> reference state_dict.

    Lets impx-trained weights drive the reference torch models (nets/gm.py:46-77
    module layout), e.g. for the cross-framework equivalence study where both
    stacks must share non-trivial weights. Round-trip pinned by
    tests/test_checkpoint_load.py."""
    import torch

    state: dict = {}
    _torch_mlp(state, "kenc.encoder", params["kenc"], config.norm_fn)
    for i, block in enumerate(params["final_proj"]):
        _torch_conv1d(state, f"final_proj.{i}", block)
    state["bin_score"] = torch.from_numpy(
        np.asarray(params["bin_score"]).copy().reshape(()))
    share = config.sharing_layers(sharing)
    for i, layer in enumerate(params["gnn"]):
        prefix = f"gnn.layers.{i}"
        _torch_mlp(state, f"{prefix}.mlp", layer["mlp"], config.norm_fn)
        if share[i]:
            _torch_conv1d(state, f"{prefix}.proj", layer["proj"])
            _torch_conv1d(state, f"{prefix}.merge", layer["merge"])
        else:
            _torch_conv1d(state, f"{prefix}.attn.proj.0", layer["attn"]["q"])
            _torch_conv1d(state, f"{prefix}.attn.proj.1", layer["attn"]["k"])
            _torch_conv1d(state, f"{prefix}.attn.proj.2", layer["attn"]["v"])
            _torch_conv1d(state, f"{prefix}.attn.merge", layer["attn"]["merge"])
    return state


def _conv2d(state: Mapping, prefix: str) -> dict:
    w = _np(state[f"{prefix}.weight"])  # [out, in, kh, kw] (OIHW)
    b = _np(state[f"{prefix}.bias"])
    return {"w": jnp.asarray(np.transpose(w, (2, 3, 1, 0))), "b": jnp.asarray(b)}  # HWIO


SUPERPOINT_CONVS = [
    "conv1a", "conv1b", "conv2a", "conv2b", "conv3a", "conv3b", "conv4a", "conv4b",
    "convPa", "convPb", "convDa", "convDb",
]


def convert_superpoint(state: Mapping) -> dict:
    """Convert superpoint_v1.pth (reference nets/superpoint.py:121-136)."""
    return {name: _conv2d(state, name) for name in SUPERPOINT_CONVS}


def load_superpoint_checkpoint(path: str) -> dict:
    import torch

    state = torch.load(path, map_location="cpu", weights_only=False)
    return convert_superpoint(state)
