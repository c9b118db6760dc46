"""Benchmark: IMP matcher throughput on one TPU chip.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Measures the flagship eval workload: DGNNS (IMP) 15-layer matcher forward
(produce_matches only_last, Sinkhorn-20) at 2048-keypoint pairs — the
configuration behind the reference's YFCC table (BASELINE.md). The reference
publishes no throughput number; the baseline constant below is the
reference's measured torch fp32 forward on its stated eval GPU class
(~25-40ms/pair on a 2080Ti at 2000 kpts => 35 pairs/s; see BASELINE.md
"Training footprint" hardware). That 35 pairs/s is an ESTIMATE, not a
published figure — every vs_baseline value inherits its uncertainty
(STATUS.md states the assumption alongside the perf table).

Relay-robust design (round 3): benchmark inputs are generated INSIDE the
timed jitted program (jax.random from a per-step folded key in the scan
body), so NOTHING larger than the model params (~27 MB program constants)
ever crosses the relay in either direction — no host->device stack uploads
(round 2's bench timed out uploading ~4 GB through a ~2 MB/s relay) and no
device->host array fetches. Generation is 16 random bits per element (no
erf_inv): ~4 MB of threefry bits per ~22 ms matcher step, identical across
all configurations being compared. The JSON line is emitted as soon
as a wall-clock budget is hit, so a slow day degrades the sample count,
never the parse.

Round 4: after the flagship JSON line (stdout, format unchanged), the
remaining BASELINE.json configurations are measured and printed as one JSON
line each ON STDERR (stdout stays a single line): EIMP bucketed compaction,
the SIFT variant, trained-weight iterative at batch 16, single-pair
iterative latency, and the training step. Extras reuse the bench_suite
measurement functions (same honesty discipline), the cached trained weights
(weights/cache/), and the persistent XLA compilation cache (.jax_cache/ —
verified to work across processes on this axon backend), and each is
skipped once the extras wall-clock budget is spent — a slow day degrades
coverage, never the flagship parse. Set BENCH_NO_EXTRAS=1 for the
flagship-only behavior.
"""
from __future__ import annotations

import json
import time

REF_GPU_PAIRS_PER_SEC = 35.0  # estimated reference throughput (see docstring)

# Emit the JSON after the first timed run if this much wall-clock has gone by
# since process start (compile + warm-up included). Driver windows are finite;
# a parsed single-run number beats an unparsed best-of-three.
SOFT_BUDGET_SEC = 20 * 60.0

# Stop starting extra configs once total process wall-clock passes this (each
# config re-checks before it begins; a started config runs to completion).
EXTRAS_BUDGET_SEC = 48 * 60.0


def main():
    import os
    import sys

    t_process_start = time.time()

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

    from bench_suite import enable_compilation_cache

    enable_compilation_cache()  # cross-process XLA cache: compiles done in a
    # prior session (or a prior bench run) load in seconds

    smoke = bool(os.environ.get("BENCH_SMOKE"))  # tiny shapes: logic check only
    n_kpts = 128 if smoke else 2048
    batch = 2 if smoke else 4  # pairs per device step
    cfg = dataclasses.replace(
        MatcherConfig.eval_config("spp", n_layers=3 if smoke else 15),
        attn_impl="xla" if smoke else "pallas",  # fused attention fast path
        compute_dtype="bfloat16",  # MXU-native attention matmuls
    )
    model = DGNNS(cfg)
    params = model.init(jax.random.PRNGKey(0))

    # Measurement notes (this environment's TPU is reached through a remote
    # relay): block_until_ready does not actually await remote completion and
    # identical (program, args) executions are result-cached, so the only
    # honest timing is: ONE jitted program that generates + matches K
    # *distinct* batches (distinct per-step folded RNG keys, seed as the only
    # argument) and returns a scalar, timed with a value readback, on a seed
    # different from the warm-up runs. K is sized so the ~28 ms fixed relay
    # round-trip is <2% of the timed region (the metric is sustained device
    # throughput; production streams continuously).
    K = 4 if smoke else 48
    dim = cfg.descriptor_dim

    @jax.jit
    def run_stream(p, seed):
        def body(acc, k):
            # distinct data each step (defeats result caching) at minimum
            # generation cost: 16 random bits per element, no erf_inv —
            # input VALUES cannot affect matcher timing (static shapes, no
            # data-dependent control flow), only their distinctness matters
            ks = jax.random.split(jax.random.fold_in(jax.random.PRNGKey(0), seed + k), 6)

            def unif(key, shape, lo=0.0, hi=1.0):
                b = jax.random.bits(key, shape, jnp.uint16)
                return lo + (hi - lo) * (b.astype(jnp.float32) * (1.0 / 65536.0))

            d = {
                "descriptors0": unif(ks[0], (batch, n_kpts, dim), -1.73, 1.73),
                "descriptors1": unif(ks[1], (batch, n_kpts, dim), -1.73, 1.73),
                "norm_keypoints0": unif(ks[2], (batch, n_kpts, 2), -0.5, 0.5),
                "norm_keypoints1": unif(ks[3], (batch, n_kpts, 2), -0.5, 0.5),
                "scores0": unif(ks[4], (batch, n_kpts)),
                "scores1": unif(ks[5], (batch, n_kpts)),
            }
            out = model.produce_matches(p, d, p=0.2, only_last=True,
                                        with_scores=False)
            return acc + jnp.sum(out["mscores0"][-1]), None
        acc, _ = jax.lax.scan(body, jnp.zeros(()), jnp.arange(K) * 1000)
        return acc

    def note(msg):
        print(f"[bench] {msg}", file=sys.stderr, flush=True)

    def emit(times):
        best = min(times)
        pairs_per_sec = K * batch / best
        print(json.dumps({
            "metric": "imp_matcher_pairs_per_sec_2048kpt_1chip",
            "value": round(pairs_per_sec, 3),
            "unit": "pairs/s",
            "vs_baseline": round(pairs_per_sec / REF_GPU_PAIRS_PER_SEC, 3),
        }), flush=True)

    note("compiling + first run")
    float(run_stream(params, jnp.asarray(1_000_000)))  # compile + warm (readback = sync)
    note("second warm run")
    float(run_stream(params, jnp.asarray(9_000_000)))  # relay warm-up, distinct data

    times = []
    for seed in (2_000_000, 3_000_000, 4_000_000):
        t0 = time.perf_counter()
        float(run_stream(params, jnp.asarray(seed)))
        dt = time.perf_counter() - t0
        note(f"timed run seed={seed}: {dt:.3f}s")
        times.append(dt)
        if time.time() - t_process_start > SOFT_BUDGET_SEC:
            note("soft budget reached — emitting with runs so far")
            break

    emit(times)

    if smoke or os.environ.get("BENCH_NO_EXTRAS"):
        return

    # ---- remaining BASELINE configs, one JSON line each on stderr --------
    import contextlib

    import bench_suite as bs
    from impx.models import AdaGMN

    def _cfg(feature="spp", **over):
        return dataclasses.replace(
            MatcherConfig.eval_config(feature, n_layers=15),
            attn_impl="pallas", compute_dtype="bfloat16", **over)

    extras = [
        # ordered by how load-bearing the claim is (budget may cut the tail)
        # staged-compaction scheduling (impx/eval/iterative_staged.py):
        # checkpoint-depth cohorts drawn from a device-resident queue, layer
        # weights trace-time constant; beats both lockstep (48) and slot
        # refill (43) on the same trained weights
        ("imp_iterative_staged", lambda: bs.bench_iterative_staged(
            DGNNS(_cfg()), 2048, batch=8, queue_size=64)),
        ("imp_iterative_trained_b16", lambda: bs.bench_iterative_trained(
            DGNNS(_cfg()), 2048, batch=16, K=3, quality_probe=False)),
        ("eimp_compact", lambda: bs.bench_forward(
            "eimp_compact4_1024_8_512_12_256",
            AdaGMN(_cfg(compaction=((4, 1024), (8, 512), (12, 256)))), 2048)),
        ("imp_sift", lambda: bs.bench_forward(
            "imp_sift", DGNNS(_cfg("sift")), 2048)),
        # the reference per-iteration objective at its measured operating
        # point: named-save 'attn' remat + full-N q-block. The custom-VJP
        # fused layers (train_fused) measure within noise (78.5 vs 79.8-80.5)
        # — the step is not replay-bound; see STATUS.md round-5 roofline
        ("train_step_1024", lambda: bs.bench_train_step(
            DGNNS(_cfg(train_remat="attn")))),
        # SuperGlue-style last-iteration-only supervision
        # (train_supervision='last'): the cheaper documented objective — the
        # 14 extra per-iteration score heads of the reference objective cost
        # ~3.8 ms/pair (the exact ablation between these two lines)
        ("train_step_1024_lastonly", lambda: bs.bench_train_step(
            DGNNS(_cfg(train_remat="attn", train_supervision="last")),
            name="train_step_lastonly")),
        ("imp_iterative_b1_latency", lambda: bs.bench_iterative_latency(
            DGNNS(_cfg()), 2048)),
        # EIMP-compact training: physical token gathering inside the training
        # scan (the training mirror of the eval compaction schedule)
        ("train_step_1024_eimp_compact", lambda: bs.bench_train_step(
            AdaGMN(_cfg(train_compaction=((4, 512), (8, 256)),
                        train_remat="attn", first_it_to_update=2)),
            name="train_step_eimp_compact")),
    ]
    for name, fn in extras:
        elapsed = time.time() - t_process_start
        if elapsed > EXTRAS_BUDGET_SEC:
            note(f"extra {name}: SKIPPED (extras budget spent at {elapsed:.0f}s)")
            continue
        note(f"extra config {name} (t={elapsed:.0f}s)")
        try:
            with contextlib.redirect_stdout(sys.stderr):
                fn()
        except Exception as e:  # an extra must never cost the flagship parse
            note(f"extra {name} FAILED: {e!r}")


if __name__ == "__main__":
    main()
