"""Benchmark suite: one JSON line per BASELINE.json eval configuration.

The driver-facing flagship number stays in bench.py (single line); this suite
measures the remaining configurations for STATUS.md:

  imp_2048            flagship IMP forward (same as bench.py)
  eimp_2048_masked    EIMP with mask-only pooling (no FLOP savings)
  eimp_2048_compact   EIMP with bucketed compaction 4:1024 (real FLOP savings)
  imp_sift_2048       SIFT variant (descriptor_dim 128)
  imp_iterative       on-device iterative match<->pose loop (pairs/s at
                      batch=1 per program; see impx/eval/iterative.py)

Timing discipline = bench.py: one jit program scanning K distinct batches,
value readback inside the timed region, fixed relay overhead <2%.

Usage: python bench_suite.py [config ...]   (default: all forward configs)
"""
from __future__ import annotations

import dataclasses
import json
import sys
import time

import numpy as np

REF_GPU_PAIRS_PER_SEC = 35.0  # see bench.py


def _stack(seed, K, batch, n_kpts, dim):
    import jax.numpy as jnp

    r = np.random.RandomState(seed)
    return {
        "descriptors0": jnp.asarray(r.randn(K, batch, n_kpts, dim), jnp.float32),
        "descriptors1": jnp.asarray(r.randn(K, batch, n_kpts, dim), jnp.float32),
        "norm_keypoints0": jnp.asarray(r.rand(K, batch, n_kpts, 2) - 0.5, jnp.float32),
        "norm_keypoints1": jnp.asarray(r.rand(K, batch, n_kpts, 2) - 0.5, jnp.float32),
        "scores0": jnp.asarray(r.rand(K, batch, n_kpts), jnp.float32),
        "scores1": jnp.asarray(r.rand(K, batch, n_kpts), jnp.float32),
        "valid0": jnp.asarray(r.rand(K, batch, n_kpts) < 0.95),
        "valid1": jnp.asarray(r.rand(K, batch, n_kpts) < 0.95),
    }


def bench_forward(name, model, n_kpts, batch=4, K=48, produce_kwargs=None):
    import jax
    import jax.numpy as jnp

    kw = dict(p=0.2, only_last=True, with_scores=False)
    kw.update(produce_kwargs or {})
    params = model.init(jax.random.PRNGKey(0))
    dim = model.config.descriptor_dim

    @jax.jit
    def run_stream(p, stack):
        def body(acc, d):
            out = model.produce_matches(p, d, **kw)
            return acc + jnp.sum(out["mscores0"][-1]), None
        return jax.lax.scan(body, jnp.zeros(()), stack)[0]

    @jax.jit
    def touch(stack):
        return sum(jnp.sum(v.astype(jnp.float32)) for v in stack.values())

    warm = _stack(1, K, batch, n_kpts, dim)
    float(touch(warm))
    float(run_stream(params, warm))
    float(run_stream(params, _stack(9, K, batch, n_kpts, dim)))

    best = None
    for seed in (2, 3, 4):
        stack = _stack(seed, K, batch, n_kpts, dim)
        float(touch(stack))
        t0 = time.perf_counter()
        float(run_stream(params, stack))
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    pairs_per_sec = K * batch / best
    print(json.dumps({
        "metric": f"{name}_pairs_per_sec_{n_kpts}kpt_1chip",
        "value": round(pairs_per_sec, 3),
        "unit": "pairs/s",
        "vs_baseline": round(pairs_per_sec / REF_GPU_PAIRS_PER_SEC, 3),
    }), flush=True)
    return pairs_per_sec


def bench_iterative(name, model, n_kpts, batch=8, K=6,
                    num_hypotheses=512, with_uncertainty=False):
    """Fused single-program iterative loop, worst case: random weights never
    converge, so every pair pays all 15 iterations + 7 checkpoint
    RANSACs — the floor of iterative throughput (trained weights early-stop
    and only go faster)."""
    import jax
    import jax.numpy as jnp
    from impx.eval.iterative_fused import iterative_fused_batched
    from impx.models.fast import stack_params

    params = model.init(jax.random.PRNGKey(0))
    stacked = stack_params(params, model.config)
    dim = model.config.descriptor_dim
    nts = jnp.full((batch,), 2e-3, jnp.float32)

    @jax.jit
    def run_stream(stacked, stack, keys):
        def body(acc, xs):
            d, key = xs
            d = dict(d)
            d["x0n"] = d["norm_keypoints0"]
            d["x1n"] = d["norm_keypoints1"]
            out = iterative_fused_batched(
                model, stacked, d, jax.random.split(key, model.config.n_layers),
                nts, num_hypotheses=num_hypotheses,
                with_uncertainty=with_uncertainty)
            return acc + jnp.sum(out["mscores0"]) + jnp.sum(out["stopped_at"]), None
        return jax.lax.scan(body, jnp.zeros(()), (stack, keys))[0]

    @jax.jit
    def touch(stack):
        return sum(jnp.sum(v.astype(jnp.float32)) for v in stack.values())

    keys = jax.random.split(jax.random.PRNGKey(1), K)
    warm = _stack(1, K, batch, n_kpts, dim)
    float(touch(warm))
    float(run_stream(stacked, warm, keys))
    float(run_stream(stacked, _stack(9, K, batch, n_kpts, dim), keys))
    best = None
    for seed in (2, 3):
        stack = _stack(seed, K, batch, n_kpts, dim)
        float(touch(stack))
        t0 = time.perf_counter()
        float(run_stream(stacked, stack, keys))
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    pairs_per_sec = K * batch / best
    print(json.dumps({
        "metric": f"{name}_pairs_per_sec_{n_kpts}kpt_1chip",
        "value": round(pairs_per_sec, 3),
        "unit": "pairs/s",
        "vs_baseline": round(pairs_per_sec / REF_GPU_PAIRS_PER_SEC, 3),
    }), flush=True)
    return pairs_per_sec


def bench_scannet_e2e(model, batch=4, K=12):
    """ScanNet protocol end to end ON DEVICE: SuperPoint extraction on
    480x640 grayscale pairs (1024 keypoints, the reference's scannet_sp.yaml
    1000-kpt budget rounded to the bucket) -> IMP matcher. One jit program
    per stream step covering extractor + matcher."""
    import jax
    import jax.numpy as jnp
    from impx.models.superpoint import extract_keypoints, init_params

    n_kpts, H, W = 1024, 480, 640
    sp_params = init_params(jax.random.PRNGKey(1))
    params = model.init(jax.random.PRNGKey(0))

    def norm_kpts(kpts):
        size = jnp.asarray([W, H], jnp.float32)
        return (kpts - size / 2.0) / (size.max() * 0.7)

    @jax.jit
    def run_stream(params, sp_params, imgs0, imgs1):
        def body(acc, pair):
            f0 = extract_keypoints(sp_params, pair[0], max_keypoints=n_kpts)
            f1 = extract_keypoints(sp_params, pair[1], max_keypoints=n_kpts)
            feed = {
                "descriptors0": f0["descriptors"],
                "descriptors1": f1["descriptors"],
                "norm_keypoints0": norm_kpts(f0["keypoints"]),
                "norm_keypoints1": norm_kpts(f1["keypoints"]),
                "scores0": f0["scores"], "scores1": f1["scores"],
                "valid0": f0["valid"], "valid1": f1["valid"],
            }
            out = model.produce_matches(params, feed, p=0.2, only_last=True,
                                        with_scores=False)
            return acc + jnp.sum(out["mscores0"][-1]), None
        return jax.lax.scan(body, jnp.zeros(()), (imgs0, imgs1))[0]

    @jax.jit
    def touch(a, b):
        return jnp.sum(a) + jnp.sum(b)

    def imgs(seed):
        r = np.random.RandomState(seed)
        return (jnp.asarray(r.rand(K, batch, H, W, 1), jnp.float32),
                jnp.asarray(r.rand(K, batch, H, W, 1), jnp.float32))

    w0, w1 = imgs(1)
    float(touch(w0, w1))
    float(run_stream(params, sp_params, w0, w1))
    w0, w1 = imgs(9)
    float(touch(w0, w1))
    float(run_stream(params, sp_params, w0, w1))
    best = None
    for seed in (2, 3):
        i0, i1 = imgs(seed)
        float(touch(i0, i1))
        t0 = time.perf_counter()
        float(run_stream(params, sp_params, i0, i1))
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    pairs_per_sec = K * batch / best
    print(json.dumps({
        "metric": "scannet_spp_e2e_pairs_per_sec_1024kpt_1chip",
        "value": round(pairs_per_sec, 3),
        "unit": "pairs/s",
        "vs_baseline": round(pairs_per_sec / REF_GPU_PAIRS_PER_SEC, 3),
    }), flush=True)
    return pairs_per_sec


def main(selected):
    import os

    import jax

    from impx.models import MatcherConfig, DGNNS, AdaGMN

    # same honesty guard as bench.py: never report interpreter numbers
    if jax.default_backend() != "tpu" and not os.environ.get("BENCH_ALLOW_CPU"):
        raise SystemExit(
            f"bench_suite.py requires a TPU backend (got {jax.default_backend()!r}); "
            "set BENCH_ALLOW_CPU=1 to measure the interpreter anyway")

    def cfg(feature="spp", **over):
        base = MatcherConfig.eval_config(feature, n_layers=15)
        return dataclasses.replace(
            base, attn_impl="pallas", compute_dtype="bfloat16", **over)

    configs = {
        "imp_2048": lambda: bench_forward("imp", DGNNS(cfg()), 2048),
        "eimp_2048_masked": lambda: bench_forward(
            "eimp_masked", AdaGMN(cfg()), 2048),
        "eimp_2048_compact": lambda: bench_forward(
            "eimp_compact4_1024", AdaGMN(cfg(compaction=((4, 1024),))), 2048),
        "imp_sift_2048": lambda: bench_forward(
            "imp_sift", DGNNS(cfg("sift")), 2048),
        "imp_iterative_2048": lambda: bench_iterative(
            "imp_iterative_worstcase", DGNNS(cfg()), 2048),
        "scannet_spp_e2e": lambda: bench_scannet_e2e(DGNNS(cfg())),
    }
    for name in (selected or list(configs)):
        configs[name]()


if __name__ == "__main__":
    main(sys.argv[1:])
