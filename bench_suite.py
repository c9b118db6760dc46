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


def main(selected):
    from impx.models import MatcherConfig, DGNNS, AdaGMN

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
    }
    for name in (selected or list(configs)):
        configs[name]()


if __name__ == "__main__":
    main(sys.argv[1:])
