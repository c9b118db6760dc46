"""Benchmark: IMP matcher throughput on one TPU chip.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Measures the flagship eval workload: DGNNS (IMP) 15-layer matcher forward
(produce_matches only_last, Sinkhorn-20) at 2048-keypoint pairs — the
configuration behind the reference's YFCC table (BASELINE.md). The reference
publishes no throughput number; the baseline constant below is the
reference's measured torch fp32 forward on its stated eval GPU class
(~25-40ms/pair on a 2080Ti at 2000 kpts => 35 pairs/s; see BASELINE.md
"Training footprint" hardware). vs_baseline = our pairs/s / 35.
"""
from __future__ import annotations

import json
import time

import numpy as np

REF_GPU_PAIRS_PER_SEC = 35.0  # estimated reference throughput (see docstring)


def main():
    import os

    import jax
    import jax.numpy as jnp

    from impx.models import MatcherConfig, DGNNS

    import dataclasses

    # Pallas silently runs in interpreter mode off-TPU (impx/ops/attention.py
    # _interpret); an interpreter number must never masquerade as the bench.
    if jax.default_backend() != "tpu" and not os.environ.get("BENCH_ALLOW_CPU"):
        raise SystemExit(
            f"bench.py requires a TPU backend (got {jax.default_backend()!r}); "
            "set BENCH_ALLOW_CPU=1 to measure the interpreter anyway")

    n_kpts = 2048
    batch = 4  # pairs per device step
    cfg = dataclasses.replace(
        MatcherConfig.eval_config("spp", n_layers=15),
        attn_impl="pallas",        # fused attention via the scan fast path
        compute_dtype="bfloat16",  # MXU-native attention matmuls
    )
    model = DGNNS(cfg)
    params = model.init(jax.random.PRNGKey(0))

    # Measurement notes (this environment's TPU is reached through a remote
    # relay): block_until_ready does not actually await remote completion and
    # identical (program, args) executions are result-cached, so the only
    # honest timing is: ONE jitted program that scans over K *distinct*
    # batches and returns a scalar, timed on a dataset different from the
    # warm-up run, with a value readback inside the timed region. K is sized
    # so the ~28 ms fixed relay round-trip is <2% of the timed region (the
    # metric is sustained device throughput; production streams continuously).
    K = 48

    def make_stack(seed):
        r = np.random.RandomState(seed)
        return {
            "descriptors0": jnp.asarray(r.randn(K, batch, n_kpts, 256), jnp.float32),
            "descriptors1": jnp.asarray(r.randn(K, batch, n_kpts, 256), jnp.float32),
            "norm_keypoints0": jnp.asarray(r.rand(K, batch, n_kpts, 2) - 0.5, jnp.float32),
            "norm_keypoints1": jnp.asarray(r.rand(K, batch, n_kpts, 2) - 0.5, jnp.float32),
            "scores0": jnp.asarray(r.rand(K, batch, n_kpts), jnp.float32),
            "scores1": jnp.asarray(r.rand(K, batch, n_kpts), jnp.float32),
        }

    @jax.jit
    def run_stream(p, stack):
        def body(acc, d):
            out = model.produce_matches(p, d, p=0.2, only_last=True,
                                        with_scores=False)
            return acc + jnp.sum(out["mscores0"][-1]), None
        acc, _ = jax.lax.scan(body, jnp.zeros(()), stack)
        return acc

    @jax.jit
    def touch(stack):
        # force host->device upload BEFORE timing: transfers in this
        # environment are relay-bound and lazy, and the metric is device
        # compute throughput (production pipelines overlap transfers)
        return sum(jnp.sum(v) for v in stack.values())

    import sys

    def note(msg):
        print(f"[bench] {msg}", file=sys.stderr, flush=True)

    warm = make_stack(1)
    note("uploading warm-up stack")
    float(touch(warm))
    note("compiling + first run")
    float(run_stream(params, warm))  # compile + warm (value readback = sync)
    note("second warm run")
    float(run_stream(params, make_stack(9)))  # second warm (relay warm-up)

    best = None
    for seed in (2, 3, 4):
        stack = make_stack(seed)
        float(touch(stack))
        t0 = time.perf_counter()
        float(run_stream(params, stack))
        dt = time.perf_counter() - t0
        note(f"timed run seed={seed}: {dt:.3f}s")
        best = dt if best is None else min(best, dt)

    pairs_per_sec = K * batch / best
    print(json.dumps({
        "metric": "imp_matcher_pairs_per_sec_2048kpt_1chip",
        "value": round(pairs_per_sec, 3),
        "unit": "pairs/s",
        "vs_baseline": round(pairs_per_sec / REF_GPU_PAIRS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
