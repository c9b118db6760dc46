"""Serialized model export for serving (jax.export / StableHLO).

The reference deploys by shipping Python + a .pth checkpoint; a TPU-native
framework can do better: `export_matcher` AOT-lowers the flagship forward
(`produce_matches(only_last=True)`) at a fixed keypoint bucket into a
serialized StableHLO artifact that a serving binary (or a later Python
process) can run WITHOUT the model code — only `jax.export.deserialize` and
the params pytree are needed. Weights are baked as constants by default
(single-file artifact) or kept as runtime arguments (`bake_params=False`)
so one artifact serves many checkpoints.

Usage:
    blob = export_matcher(model, params, n_kpts=2048)
    Path("imp_2048.shlo").write_bytes(blob)
    ...
    fn = load_matcher(Path("imp_2048.shlo").read_bytes())
    out = fn(feed)           # dict with indices0 / mscores0 / scores
"""
from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp


def _example_feed(n_kpts: int, dim: int, batch: int) -> dict[str, Any]:
    f32 = jnp.float32
    return {
        "descriptors0": jnp.zeros((batch, n_kpts, dim), f32),
        "descriptors1": jnp.zeros((batch, n_kpts, dim), f32),
        "norm_keypoints0": jnp.zeros((batch, n_kpts, 2), f32),
        "norm_keypoints1": jnp.zeros((batch, n_kpts, 2), f32),
        "scores0": jnp.zeros((batch, n_kpts), f32),
        "scores1": jnp.zeros((batch, n_kpts), f32),
        "valid0": jnp.zeros((batch, n_kpts), bool),
        "valid1": jnp.zeros((batch, n_kpts), bool),
    }


def matcher_serving_fn(model, params, *, p: float = 0.2,
                       bake_params: bool = True) -> Callable:
    """The jittable serving entry: feed dict -> {indices0, mscores0}."""
    def serve(feed, *maybe_params):
        prm = params if bake_params else maybe_params[0]
        out = model.produce_matches(prm, feed, p=p, only_last=True,
                                    with_scores=False)
        return {"indices0": out["indices0"][-1], "mscores0": out["mscores0"][-1]}
    return serve


def export_matcher(model, params, *, n_kpts: int = 2048, batch: int = 1,
                   p: float = 0.2, bake_params: bool = True,
                   platforms=None) -> bytes:
    """Serialize the matcher forward at a fixed bucket to StableHLO bytes.

    platforms defaults to the current backend; pass e.g. ("tpu", "cpu") to
    produce a multi-platform artifact.
    """
    serve = matcher_serving_fn(model, params, p=p, bake_params=bake_params)
    dim = model.config.descriptor_dim
    args = (_example_feed(n_kpts, dim, batch),)
    if not bake_params:
        args = args + (params,)
    exp = jax.export.export(jax.jit(serve), platforms=platforms)(*args)
    return bytes(exp.serialize())


def load_matcher(blob: bytes) -> Callable:
    """Deserialize an exported matcher; returns fn(feed[, params]) -> dict.
    Needs no impx model code — the artifact is self-contained StableHLO."""
    exp = jax.export.deserialize(blob)
    return lambda *args: exp.call(*args)
