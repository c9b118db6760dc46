"""Stage breakdown of SuperPoint extraction on the current backend.

Times cumulative prefixes of the extraction pipeline (backbone -> NMS ->
border+top-k -> descriptor sampling), each as one jitted program scanning K
applications over device-generated images, with every stage output consumed
so XLA cannot dead-code-eliminate it. Differences between consecutive rows
attribute cost to each stage (reference nets/superpoint.py:148-176 is the
equivalent torch pipeline).

Usage: python -m impx.eval.profile_superpoint [--batch 4] [--K 24]
"""
from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp

from impx.models import superpoint as sp


def _timed(name, fn, batch, K):
    @jax.jit
    def run(seed):
        def body(acc, k):
            key = jax.random.fold_in(jax.random.PRNGKey(0), seed + k)
            img = jax.random.uniform(key, (batch, 480, 640, 1), jnp.float32)
            return acc + fn(img), None
        return jax.lax.scan(body, jnp.zeros(()), jnp.arange(K) * 1000)[0]

    float(run(jnp.asarray(1_000_000)))
    best = None
    for seed in (2_000_000, 3_000_000, 4_000_000):
        t0 = time.perf_counter()
        float(run(jnp.asarray(seed)))
        best = min(best or 1e9, time.perf_counter() - t0)
    ms = best / (K * batch) * 1e3
    print(f"{name:34s} {ms:8.3f} ms/image")
    return ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--K", type=int, default=24)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32

    params = sp.init_params(jax.random.PRNGKey(1))

    def backbone_only(img):
        scores, desc = sp.backbone(params, img, compute_dtype=dtype)
        return jnp.sum(scores) + jnp.sum(desc)

    def plus_nms(img):
        scores, desc = sp.backbone(params, img, compute_dtype=dtype)
        return jnp.sum(sp.simple_nms(scores, 4)) + jnp.sum(desc)

    def plus_topk(img):
        # mirrors the shipped extract_keypoints border + flat top_k stage
        scores, desc = sp.backbone(params, img, compute_dtype=dtype)
        scores = sp.simple_nms(scores, 4)
        b, h, w = scores.shape
        ys = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
        xs = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
        ok = (ys >= 4) & (ys < h - 4) & (xs >= 4) & (xs < w - 4)
        scores = jnp.where(ok[None], scores, 0.0)
        ts, ti = jax.lax.top_k(scores.reshape(b, h * w), 1024)
        return jnp.sum(ts) + jnp.sum(ti) + jnp.sum(desc)

    def full(img):
        f = sp.extract_keypoints(params, img, compute_dtype=dtype)
        return (jnp.sum(f["scores"]) + jnp.sum(f["descriptors"])
                + jnp.sum(f["keypoints"]) + jnp.sum(f["valid"]))

    t_bb = _timed("backbone (convs+softmax+norm)", backbone_only,
                  args.batch, args.K)
    t_nms = _timed("+ simple_nms(r=4)", plus_nms, args.batch, args.K)
    t_topk = _timed("+ border + top_k(307200->1024)", plus_topk,
                    args.batch, args.K)
    t_full = _timed("+ descriptor sampling (full)", full, args.batch, args.K)
    print(f"\nstage attribution: backbone {t_bb:.3f} | nms {t_nms - t_bb:.3f}"
          f" | topk {t_topk - t_nms:.3f} | sample {t_full - t_topk:.3f}"
          f"  (ms/image)")


if __name__ == "__main__":
    main()
