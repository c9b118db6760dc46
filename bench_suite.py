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
value readback inside the timed region, fixed relay overhead <2%. Data is
generated ON DEVICE inside the timed program wherever the workload permits
(round 2's host-generated stacks timed out uploading ~4 GB through a slow
relay); the trained-iterative config needs host-built matchable geometry, so
it uploads ONE stack and derives per-run variation by a device-side roll.

Usage: python bench_suite.py [config ...]   (default: all forward configs)
"""
from __future__ import annotations

import dataclasses
import json
import sys
import time

import numpy as np

REF_GPU_PAIRS_PER_SEC = 35.0  # see bench.py

# Bump when the training path changes in a way the hashed (config, hyperparams)
# recipe can't see (e.g. loss code edits) — invalidates weights/cache entries.
_WEIGHT_CACHE_VERSION = 1


def enable_compilation_cache():
    """Persistent XLA compilation cache (verified working across processes on
    this environment's axon TPU backend: 76 s compile -> 1.5 s reload). The
    bench entry points enable it so a driver run after a session that already
    compiled these programs spends seconds, not tens of minutes, in compiles.
    Gitignored (.jax_cache/)."""
    from impx.tools.compile_cache import enable

    enable()


def _gen_batch(seed, batch, n_kpts, dim, with_valid=True):
    """Device-side random matcher feed (traced inside the timed program —
    the only relay traffic is the scalar seed)."""
    import jax
    import jax.numpy as jnp

    ks = jax.random.split(jax.random.fold_in(jax.random.PRNGKey(0), seed), 8)

    # 16 random bits per element, no erf_inv — input VALUES cannot affect
    # matcher timing (static shapes, no data-dependent control flow), only
    # their per-step distinctness matters (same policy as bench.py)
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
    if with_valid:
        d["valid0"] = unif(ks[6], (batch, n_kpts)) < 0.95
        d["valid1"] = unif(ks[7], (batch, n_kpts)) < 0.95
    return d


def bench_forward(name, model, n_kpts, batch=4, K=48, produce_kwargs=None):
    import jax
    import jax.numpy as jnp

    kw = dict(p=0.2, only_last=True, with_scores=False)
    kw.update(produce_kwargs or {})
    params = model.init(jax.random.PRNGKey(0))
    dim = model.config.descriptor_dim

    @jax.jit
    def run_stream(p, seed):
        def body(acc, k):
            d = _gen_batch(seed + k, batch, n_kpts, dim)
            out = model.produce_matches(p, d, **kw)
            return acc + jnp.sum(out["mscores0"][-1]), None
        return jax.lax.scan(body, jnp.zeros(()), jnp.arange(K) * 1000)[0]

    float(run_stream(params, jnp.asarray(1_000_000)))
    float(run_stream(params, jnp.asarray(9_000_000)))

    best = None
    for seed in (2_000_000, 3_000_000, 4_000_000):
        t0 = time.perf_counter()
        float(run_stream(params, jnp.asarray(seed)))
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
    def run_stream(stacked, seed, keys):
        def body(acc, xs):
            k, key = xs
            d = _gen_batch(seed + k, batch, n_kpts, dim)
            d["x0n"] = d["norm_keypoints0"]
            d["x1n"] = d["norm_keypoints1"]
            out = iterative_fused_batched(
                model, stacked, d, jax.random.split(key, model.config.n_layers),
                nts, num_hypotheses=num_hypotheses,
                # keep the published worst-case floor reproducible: pins the
                # 8-pt solver and the hypothesis budget (sampling is the
                # score-weighted PROSAC default over the 512-match
                # compaction, NOT uniform); the trained config below uses
                # the 5-pt default
                sample_size=8,
                with_uncertainty=with_uncertainty)
            return acc + jnp.sum(out["mscores0"]) + jnp.sum(out["stopped_at"]), None
        return jax.lax.scan(body, jnp.zeros(()),
                            (jnp.arange(K) * 1000, keys))[0]

    keys = jax.random.split(jax.random.PRNGKey(1), K)
    float(run_stream(stacked, jnp.asarray(1_000_000), keys))
    float(run_stream(stacked, jnp.asarray(9_000_000), keys))
    best = None
    for seed in (2_000_000, 3_000_000):
        t0 = time.perf_counter()
        float(run_stream(stacked, jnp.asarray(seed), keys))
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


def _trained_matcher_params(tm, train_kpts=512, train_steps=500):
    """Briefly train `tm` on synthetic matchable scenes (rotating batches),
    with on-disk caching keyed by a hash of (config, hyperparams, recipe).
    Returns (params, acc_corr)."""
    import jax
    import jax.numpy as jnp
    from impx.data.megadepth import SyntheticMegadepth
    from impx.train.step import (TrainHyperParams, init_stats, make_optimizer,
                                 make_train_step)

    dim = tm.config.descriptor_dim
    # The training recipe is identical across the iterative configs (always
    # the DGNNS scan fast path at the same dim/kpts/steps), so the trained
    # weights are cached on disk — re-runs and the EIMP variant skip the
    # 500-step warm-up entirely (weights/cache/ is gitignored). The cache key
    # hashes the full matcher config + the training hyperparams so a recipe
    # or model-config change can never silently reuse stale weights; leaves
    # are stored as plain npz arrays (no pickle).
    import hashlib
    import os
    # deep (15-layer) matcher from scratch: clip grads and keep lr
    # moderate or the first steps blow up and the NaN guard no-ops
    hp = TrainHyperParams(lr=3e-4, decay_iter=10**6, grad_clip=1.0)
    recipe = repr((dataclasses.asdict(tm.config), dataclasses.asdict(hp),
                   train_kpts, train_steps, _WEIGHT_CACHE_VERSION))
    recipe_hash = hashlib.sha256(recipe.encode()).hexdigest()[:12]
    cache_dir = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "weights", "cache")
    cache_fn = os.path.join(
        cache_dir, f"bench_it_{type(tm).__name__}_{dim}_{recipe_hash}.npz")
    acc_corr = None
    if os.path.isfile(cache_fn):
        with np.load(cache_fn) as blob:
            leaves = [jnp.asarray(blob[f"leaf_{i}"])
                      for i in range(int(blob["n_leaves"]))]
            acc_corr = float(blob["acc_corr"])
        treedef = jax.tree.structure(tm.init(jax.random.PRNGKey(0)))
        params = jax.tree.unflatten(treedef, leaves)
        print(f"[train] cached weights {cache_fn}", file=sys.stderr, flush=True)
    else:
        params = tm.init(jax.random.PRNGKey(0))
        step = make_train_step(tm, hp, donate=False)
        opt = make_optimizer(hp).init(params)
        ds = SyntheticMegadepth(num_pairs=128, nfeatures=train_kpts,
                                desc_dim=dim, seed=0)
        batches = []
        for bi in range(8):
            samples = [ds[bi * 16 + i] for i in range(16)]
            batches.append(
                {k: jnp.asarray(np.stack([s[k] for s in samples]), jnp.float32)
                 for k in samples[0] if isinstance(samples[0][k], np.ndarray)})
        for it in range(train_steps):
            params, opt, metrics, _ = step(params, opt, jnp.asarray(it),
                                           batches[it % len(batches)],
                                           init_stats())
            if (it + 1) % max(train_steps // 5, 1) == 0:
                print(f"[train {it + 1}/{train_steps}] loss "
                      f"{float(metrics['loss']):.3f} acc_corr "
                      f"{float(metrics['acc_corr']):.1f} bad "
                      f"{int(metrics['bad_loss'])}", file=sys.stderr, flush=True)
        acc_corr = float(metrics["acc_corr"])
        leaves = jax.tree.leaves(params)
        os.makedirs(os.path.dirname(cache_fn), exist_ok=True)
        np.savez(cache_fn,
                 n_leaves=np.asarray(len(leaves)),
                 acc_corr=np.asarray(acc_corr),
                 **{f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)})
    print(json.dumps({"metric": "iterative_trained_train_acc_corr",
                      "value": round(float(acc_corr), 2),
                      "unit": f"correct matches/pair after {train_steps} steps",
                      "vs_baseline": 0}), flush=True)
    return params, acc_corr


def bench_iterative_trained(model, n_kpts=2048, batch=8, K=6, train_kpts=512,
                            train_steps=500, num_hypotheses=256,
                            valid_its=None, eval_inlier_frac=0.25,
                            min_kpts=25, pose_stop_deg=1.5,
                            with_uncertainty=False, name="imp",
                            train_model=None, quality_probe=True):
    """Iterative loop with TRAINED weights on matchable synthetic pairs: the
    early-stop case (converged pairs flip the whole scan to the identity
    branch). This is the deployment-relevant number — the worst-case config
    (random weights, never converges) is the floor. Also reports convergence
    fraction, mean stopping iteration and median pose error vs ground truth
    so the speed is tied to demonstrated quality.

    Data discipline (round 4): every scan step generates DISTINCT matchable
    geometry ON DEVICE (impx/data/synthetic_device.py — same distribution as
    the host synthesize_pair), so runs vary by seed like bench.py instead of
    rolling one uploaded stack; generation costs ~ms against the ~100s-of-ms
    fused-loop step and is identical across configs being compared.

    train_model: e.g. train DGNNS on the differentiable scan fast path and
    bench the SAME weights under AdaGMN's uncertainty pooling (identical
    parameter structure; EIMP is IMP + pooling, reference adgm.py:15)."""
    import jax
    import jax.numpy as jnp
    from impx.data.synthetic_device import synthesize_feed_device
    from impx.eval.iterative_fused import iterative_fused_batched
    from impx.geometry.pose import compute_pose_error_np
    from impx.models.fast import stack_params

    dim = model.config.descriptor_dim
    tm = train_model if train_model is not None else model
    params, _ = _trained_matcher_params(tm, train_kpts, train_steps)

    stacked = stack_params(params, model.config)
    nts = jnp.full((batch,), 2e-3, jnp.float32)
    keys = jax.random.split(jax.random.PRNGKey(1), K)

    extra = {} if valid_its is None else {"valid_its": tuple(valid_its)}

    def run_one(stacked, d, key):
        # one key REUSED at every checkpoint: consecutive checkpoints then
        # draw the same minimal sets (modulo match changes), so the pose-diff
        # stopping test measures the matcher's change, not RANSAC sampling
        # noise (cv2's deterministic seeding has the same effect in the
        # reference loop)
        layer_keys = jnp.tile(key[None, :], (model.config.n_layers, 1))
        return iterative_fused_batched(
            model, stacked, d, layer_keys,
            nts, num_hypotheses=num_hypotheses, min_kpts=min_kpts,
            pose_stop_deg=pose_stop_deg, with_uncertainty=with_uncertainty,
            **extra)

    def gen(seed, k):
        gk = jax.random.fold_in(jax.random.PRNGKey(7), seed + k)
        return synthesize_feed_device(gk, batch, n_kpts, dim,
                                      inlier_frac=eval_inlier_frac)

    @jax.jit
    def run_stream(stacked, seed, keys):
        def body(acc, xs):
            k, key = xs
            d, _, _ = gen(seed, k)
            out = run_one(stacked, d, key)
            return acc + jnp.sum(out["mscores0"]) + jnp.sum(out["stopped_at"]), None
        return jax.lax.scan(body, jnp.zeros(()),
                            (jnp.arange(K) * 1000, keys))[0]

    # quality probe (untimed): convergence fraction, stop iteration, pose err
    # over K*batch fresh device-generated pairs with their GT poses
    if quality_probe:
        @jax.jit
        def probe_one(stacked, seed, key):
            d, R_gt, t_gt = gen(seed, 0)
            out = run_one(stacked, d, key)
            return (out["converged"], out["stopped_at"],
                    out["R"], out["t"], R_gt, t_gt)

        keys_q = jax.random.split(jax.random.PRNGKey(3), K)
        conv_l, stops_l, errs = [], [], []
        for k in range(K):
            c, s, Re, te, Rg, tg = probe_one(
                stacked, jnp.asarray(50_000 + k * 977), keys_q[k])
            conv_l.append(np.asarray(c))
            stops_l.append(np.asarray(s))
            Re, te, Rg, tg = map(np.asarray, (Re, te, Rg, tg))
            for bi in range(batch):
                T_0to1 = np.eye(4)
                T_0to1[:3, :3] = Rg[bi]
                T_0to1[:3, 3] = tg[bi]
                err_t, err_R = compute_pose_error_np(T_0to1, Re[bi], te[bi])
                errs.append(max(err_R, err_t))
        conv = np.concatenate(conv_l)
        stops = np.concatenate(stops_l)
        print(json.dumps({
            "metric": "iterative_trained_quality",
            "value": round(float(np.median(errs)), 2),
            "unit": f"median pose err deg; converged {conv.mean():.2f}; "
                    f"mean stop {stops.mean():.1f}/{model.config.n_layers}",
            "vs_baseline": 0}), flush=True)

    keys = jax.random.split(jax.random.PRNGKey(1), K)
    float(run_stream(stacked, jnp.asarray(1_000_000), keys))  # compile + warm
    float(run_stream(stacked, jnp.asarray(9_000_000), keys))
    best = None
    for seed in (2_000_000, 3_000_000):
        t0 = time.perf_counter()
        float(run_stream(stacked, jnp.asarray(seed), keys))
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    pairs_per_sec = K * batch / best
    print(json.dumps({
        "metric": f"{name}_iterative_trained_pairs_per_sec_{n_kpts}kpt_1chip",
        "value": round(pairs_per_sec, 3),
        "unit": "pairs/s",
        "vs_baseline": round(pairs_per_sec / REF_GPU_PAIRS_PER_SEC, 3),
    }), flush=True)
    return pairs_per_sec


def bench_iterative_refill(model, n_kpts=2048, slots=16, queue_size=64, K=2,
                           train_kpts=512, train_steps=500,
                           num_hypotheses=256, eval_inlier_frac=0.25,
                           min_kpts=25, pose_stop_deg=1.5, name="imp"):
    """Dynamic-refill iterative loop (impx/eval/iterative_refill.py): a
    device-resident queue of `queue_size` pairs drained through `slots`
    always-busy slots. vs the lockstep fused loop (bench_iterative_trained),
    a slot whose pair converges at iteration 6 immediately picks up the next
    pair instead of idling until the batch's straggler finishes — converting
    the bimodal stop distribution's ~30% wasted iterations into throughput.
    Same data discipline: distinct device-generated matchable scenes per
    queue, value readback in the timed region."""
    import jax
    import jax.numpy as jnp
    from impx.data.synthetic_device import synthesize_feed_device
    from impx.eval.iterative_refill import iterative_refill_queue
    from impx.models.fast import stack_params

    dim = model.config.descriptor_dim
    params, _ = _trained_matcher_params(model, train_kpts, train_steps)
    stacked = stack_params(params, model.config)

    def gen(seed):
        gk = jax.random.fold_in(jax.random.PRNGKey(7), seed)
        feed, R, t = synthesize_feed_device(gk, queue_size, n_kpts, dim,
                                            inlier_frac=eval_inlier_frac)
        feed["norm_threshs"] = jnp.full((queue_size,), 2e-3, jnp.float32)
        return feed, R, t

    @jax.jit
    def run_stream(stacked, seed):
        def body(acc, k):
            queue, _, _ = gen(seed + k)
            out = iterative_refill_queue(
                model, stacked, queue, jax.random.PRNGKey(1), slots=slots,
                num_hypotheses=num_hypotheses, min_kpts=min_kpts,
                pose_stop_deg=pose_stop_deg)
            return acc + jnp.sum(out["mscores0"]) + jnp.sum(out["stopped_at"]), \
                (out["converged"], out["stopped_at"], out["n_steps"])
        return jax.lax.scan(body, jnp.zeros(()), jnp.arange(K) * 1000)

    acc, (conv, stops, nsteps) = run_stream(stacked, jnp.asarray(1_000_000))
    float(acc)
    float(run_stream(stacked, jnp.asarray(9_000_000))[0])
    best = None
    for seed in (2_000_000, 3_000_000):
        t0 = time.perf_counter()
        acc, stats = run_stream(stacked, jnp.asarray(seed))
        float(acc)
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    conv, stops, nsteps = map(np.asarray, stats)
    pairs_per_sec = K * queue_size / best
    print(json.dumps({
        "metric": f"{name}_iterative_refill_pairs_per_sec_{n_kpts}kpt_1chip",
        "value": round(pairs_per_sec, 3),
        "unit": (f"pairs/s (queue {queue_size}, slots {slots}; converged "
                 f"{conv.mean():.2f}, mean stop {stops.mean():.1f}/"
                 f"{model.config.n_layers}, steps/queue {nsteps.mean():.0f})"),
        "vs_baseline": round(pairs_per_sec / REF_GPU_PAIRS_PER_SEC, 3),
    }), flush=True)
    return pairs_per_sec


def bench_iterative_staged(model, n_kpts=2048, batch=16, queue_size=64, K=2,
                           train_kpts=512, train_steps=500,
                           num_hypotheses=256, eval_inlier_frac=0.25,
                           min_kpts=25, pose_stop_deg=1.5, name="imp"):
    """Staged-compaction iterative loop (impx/eval/iterative_staged.py):
    checkpoint-depth cohorts with trace-time-constant layer weights — the
    third scheduling point between lockstep (whole batch waits on the
    straggler) and slot refill (always busy but every matmul runs with
    per-slot gathered weights). Same data + timing discipline as the other
    iterative benches."""
    import jax
    import jax.numpy as jnp
    from impx.data.synthetic_device import synthesize_feed_device
    from impx.eval.iterative_staged import iterative_staged_queue
    from impx.models.fast import stack_params

    dim = model.config.descriptor_dim
    params, _ = _trained_matcher_params(model, train_kpts, train_steps)
    stacked = stack_params(params, model.config)

    def gen(seed):
        gk = jax.random.fold_in(jax.random.PRNGKey(7), seed)
        feed, R, t = synthesize_feed_device(gk, queue_size, n_kpts, dim,
                                            inlier_frac=eval_inlier_frac)
        feed["norm_threshs"] = jnp.full((queue_size,), 2e-3, jnp.float32)
        return feed, R, t

    @jax.jit
    def run_stream(stacked, seed):
        def body(acc, k):
            queue, _, _ = gen(seed + k)
            out = iterative_staged_queue(
                model, stacked, queue, jax.random.PRNGKey(1), batch=batch,
                num_hypotheses=num_hypotheses, min_kpts=min_kpts,
                pose_stop_deg=pose_stop_deg)
            return acc + jnp.sum(out["mscores0"]) + jnp.sum(out["stopped_at"]), \
                (out["converged"], out["stopped_at"], out["n_steps"])
        return jax.lax.scan(body, jnp.zeros(()), jnp.arange(K) * 1000)

    acc, (conv, stops, nsteps) = run_stream(stacked, jnp.asarray(1_000_000))
    float(acc)
    float(run_stream(stacked, jnp.asarray(9_000_000))[0])
    best = None
    for seed in (2_000_000, 3_000_000):
        t0 = time.perf_counter()
        acc, stats = run_stream(stacked, jnp.asarray(seed))
        float(acc)
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    conv, stops, nsteps = map(np.asarray, stats)
    pairs_per_sec = K * queue_size / best
    print(json.dumps({
        "metric": f"{name}_iterative_staged_pairs_per_sec_{n_kpts}kpt_1chip",
        "value": round(pairs_per_sec, 3),
        "unit": (f"pairs/s (queue {queue_size}, cohort {batch}; converged "
                 f"{conv.mean():.2f}, mean stop {stops.mean():.1f}/"
                 f"{model.config.n_layers}, steps/queue {nsteps.mean():.0f})"),
        "vs_baseline": round(pairs_per_sec / REF_GPU_PAIRS_PER_SEC, 3),
    }), flush=True)
    return pairs_per_sec


def bench_iterative_latency(model, n_kpts=2048, n_pairs=24, train_kpts=512,
                            train_steps=500, num_hypotheses=256,
                            min_kpts=25, pose_stop_deg=1.5, name="imp"):
    """Single-pair iterative serving latency (ms/pair at batch 1, TRAINED
    weights): the reference's flagship use case is one pair in, one pose out
    (eval/matching.py:16-123). One jitted program generates a fresh matchable
    pair on device (distinct per call — defeats the relay result cache) and
    runs the fused loop end to end; each call is timed individually with a
    value readback and p50/p90 are reported. The measured time includes this
    environment's ~28 ms relay round trip — an upper bound on on-host serving
    latency (noted in the unit string)."""
    import jax
    import jax.numpy as jnp
    from impx.data.synthetic_device import synthesize_feed_device
    from impx.eval.iterative_fused import iterative_fused_batched
    from impx.models.fast import stack_params

    dim = model.config.descriptor_dim
    params, _ = _trained_matcher_params(model, train_kpts, train_steps)
    stacked = stack_params(params, model.config)
    nts = jnp.full((1,), 2e-3, jnp.float32)

    @jax.jit
    def run_pair(stacked, seed):
        gk = jax.random.fold_in(jax.random.PRNGKey(7), seed)
        d, _, _ = synthesize_feed_device(gk, 1, n_kpts, dim)
        key = jax.random.fold_in(jax.random.PRNGKey(1), seed)
        layer_keys = jnp.tile(key[None, :], (model.config.n_layers, 1))
        out = iterative_fused_batched(
            model, stacked, d, layer_keys, nts,
            num_hypotheses=num_hypotheses, min_kpts=min_kpts,
            pose_stop_deg=pose_stop_deg)
        return (jnp.sum(out["mscores0"]) + jnp.sum(out["stopped_at"]),
                out["converged"][0], out["stopped_at"][0])

    # compile + relay warm-up on seeds disjoint from the timed ones
    jax.block_until_ready(run_pair(stacked, jnp.asarray(10_000_000)))
    float(run_pair(stacked, jnp.asarray(11_000_000))[0])

    lat_ms, n_conv, stops = [], 0, []
    for i in range(n_pairs):
        t0 = time.perf_counter()
        acc, conv, stop = run_pair(stacked, jnp.asarray(2_000_000 + i * 131))
        float(acc)  # value readback = the only honest sync on this relay
        lat_ms.append((time.perf_counter() - t0) * 1e3)
        n_conv += int(conv)
        stops.append(int(stop))
    p50 = float(np.percentile(lat_ms, 50))
    p90 = float(np.percentile(lat_ms, 90))
    print(json.dumps({
        "metric": f"{name}_iterative_b1_latency_ms_{n_kpts}kpt_1chip",
        "value": round(p50, 2),
        "unit": (f"ms/pair p50 END-TO-END incl ~28ms relay RTT (p90 "
                 f"{p90:.1f}; converged {n_conv}/{n_pairs}, mean stop "
                 f"{np.mean(stops):.1f}/{model.config.n_layers}; see the "
                 "b1_compute line for the device-only split)"),
        # baseline: one pair per 1/35 s on the estimated reference GPU
        "vs_baseline": round((1000.0 / 35.0) / p50, 3),
    }), flush=True)

    # ---- compute-only split: CHAIN n_pairs sequential pairs inside ONE jit
    # program (pair k+1's input carries a negligible but unfoldable term from
    # pair k's output, forcing serial execution), so the per-pair device
    # latency is total/M with the relay round trip amortized away — the
    # number an on-host serving deployment would see.
    @jax.jit
    def run_chain(stacked, seed):
        def body(c, k):
            gk = jax.random.fold_in(jax.random.PRNGKey(7), seed + k)
            d, _, _ = synthesize_feed_device(gk, 1, n_kpts, dim)
            # serialize: depend on the previous pair's result (1e-24 on
            # scores is below bf16/fp32 relevance but not constant-foldable)
            d = dict(d, scores0=d["scores0"] + c * 1e-24)
            key = jax.random.fold_in(jax.random.PRNGKey(1), seed + k)
            layer_keys = jnp.tile(key[None, :], (model.config.n_layers, 1))
            out = iterative_fused_batched(
                model, stacked, d, layer_keys, nts,
                num_hypotheses=num_hypotheses, min_kpts=min_kpts,
                pose_stop_deg=pose_stop_deg)
            c = jnp.sum(out["mscores0"]) + jnp.sum(out["stopped_at"])
            return c, (out["converged"][0], out["stopped_at"][0])
        c, (conv, stop) = jax.lax.scan(
            body, jnp.zeros(()), jnp.arange(n_pairs) * 131)
        return c, conv, stop

    float(run_chain(stacked, jnp.asarray(20_000_000))[0])  # compile + warm
    float(run_chain(stacked, jnp.asarray(21_000_000))[0])
    best, stats = None, None
    for seed in (22_000_000, 23_000_000):
        t0 = time.perf_counter()
        c, conv, stop = run_chain(stacked, jnp.asarray(seed))
        float(c)
        dt = time.perf_counter() - t0
        if best is None or dt < best:
            best, stats = dt, (np.asarray(conv), np.asarray(stop))
    ms_pair = best / n_pairs * 1e3
    conv, stop = stats
    print(json.dumps({
        "metric": f"{name}_iterative_b1_compute_ms_{n_kpts}kpt_1chip",
        "value": round(ms_pair, 2),
        "unit": (f"ms/pair DEVICE COMPUTE ONLY, mean over {n_pairs} chained "
                 f"pairs in one program (no relay RTT; converged "
                 f"{int(conv.sum())}/{n_pairs}, mean stop {stop.mean():.1f}/"
                 f"{model.config.n_layers})"),
        "vs_baseline": round((1000.0 / 35.0) / ms_pair, 3),
    }), flush=True)
    return p50


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
    def run_stream(params, sp_params, seed):
        def body(acc, k):
            ks = jax.random.split(
                jax.random.fold_in(jax.random.PRNGKey(0), seed + k), 2)
            pair = (jax.random.uniform(ks[0], (batch, H, W, 1), jnp.float32),
                    jax.random.uniform(ks[1], (batch, H, W, 1), jnp.float32))
            # bf16 CNN (fp32 conv accumulation) — same dtype policy as the
            # matcher; parity: tests/test_superpoint.py::test_bf16_extraction
            f0 = extract_keypoints(sp_params, pair[0], max_keypoints=n_kpts,
                                   compute_dtype=jnp.bfloat16)
            f1 = extract_keypoints(sp_params, pair[1], max_keypoints=n_kpts,
                                   compute_dtype=jnp.bfloat16)
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
        return jax.lax.scan(body, jnp.zeros(()), jnp.arange(K) * 1000)[0]

    float(run_stream(params, sp_params, jnp.asarray(1_000_000)))
    float(run_stream(params, sp_params, jnp.asarray(9_000_000)))
    best = None
    for seed in (2_000_000, 3_000_000):
        t0 = time.perf_counter()
        float(run_stream(params, sp_params, jnp.asarray(seed)))
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


def bench_superpoint(H=480, W=640, batch=4, K=24, max_keypoints=1024):
    """SuperPoint extraction alone (bf16 backbone, fp32 conv accumulation) in
    ms/image — decomposes the ScanNet-e2e number into CNN + matcher parts
    (reference nets/superpoint.py:148-176 runs this per image on GPU)."""
    import jax
    import jax.numpy as jnp
    from impx.models.superpoint import extract_keypoints, init_params

    sp_params = init_params(jax.random.PRNGKey(1))

    @jax.jit
    def run_stream(sp_params, seed):
        def body(acc, k):
            key = jax.random.fold_in(jax.random.PRNGKey(0), seed + k)
            img = jax.random.uniform(key, (batch, H, W, 1), jnp.float32)
            f = extract_keypoints(sp_params, img, max_keypoints=max_keypoints,
                                  compute_dtype=jnp.bfloat16)
            # consume EVERY output head so XLA cannot dead-code-eliminate
            # the descriptor branch (scores alone don't depend on it)
            return acc + jnp.sum(f["scores"]) \
                + jnp.sum(f["descriptors"].astype(jnp.float32)) \
                + jnp.sum(f["keypoints"]) + jnp.sum(f["valid"]), None
        return jax.lax.scan(body, jnp.zeros(()), jnp.arange(K) * 1000)[0]

    float(run_stream(sp_params, jnp.asarray(1_000_000)))
    float(run_stream(sp_params, jnp.asarray(9_000_000)))
    best = None
    for seed in (2_000_000, 3_000_000):
        t0 = time.perf_counter()
        float(run_stream(sp_params, jnp.asarray(seed)))
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    ms_per_image = best / (K * batch) * 1e3
    print(json.dumps({
        "metric": f"superpoint_ms_per_image_{H}x{W}_bf16_1chip",
        "value": round(ms_per_image, 3),
        "unit": f"ms/image ({max_keypoints} kpts)",
        "vs_baseline": 0,
    }), flush=True)
    return ms_per_image


def bench_kernels(n_kpts=2048, batch=4, K=200):
    """Kernel-level microbenchmarks behind the roofline numbers in STATUS.md:
    fused attention (one layer application at the eval shape) and the fused
    non-log Sinkhorn head (dist -> plan stats). One jit program scanning K
    applications of each kernel over device-generated data; emits one JSON
    line per kernel in ms/application."""
    import jax
    import jax.numpy as jnp

    from impx.ops.attention import _interpret
    from impx.ops.pallas.attention import mha_fused
    from impx.ops.pallas.sinkhorn import sinkhorn_fused_stats

    interp = _interpret()  # CPU smoke runs the interpreter; TPU the kernels
    h, dh = 4, 64

    def timed(name, fn, unit="ms/app"):
        @jax.jit
        def run(seed):
            def body(acc, k):
                key = jax.random.fold_in(jax.random.PRNGKey(0), seed + k)
                return acc + fn(key), None
            return jax.lax.scan(body, jnp.zeros(()), jnp.arange(K) * 7)[0]

        float(run(jnp.asarray(10)))
        best = None
        for seed in (20, 30):
            t0 = time.perf_counter()
            float(run(jnp.asarray(seed)))
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        ms = best / K * 1e3
        print(json.dumps({"metric": f"kernel_{name}_{n_kpts}", "value":
                          round(ms, 4), "unit": unit, "vs_baseline": 0}),
              flush=True)

    mask = jnp.ones((batch, n_kpts), bool)

    def attn_app(key):
        ks = jax.random.split(key, 3)
        q = jax.random.normal(ks[0], (batch, h, n_kpts, dh), jnp.bfloat16)
        kk = jax.random.normal(ks[1], (batch, h, n_kpts, dh), jnp.bfloat16)
        v = jax.random.normal(ks[2], (batch, h, n_kpts, dh), jnp.bfloat16)
        out = mha_fused(q, kk, v, mask, interpret=interp)
        return jnp.sum(out.astype(jnp.float32)[0, 0, 0])

    def sink_app(key):
        dist = jax.random.normal(key, (batch, n_kpts, n_kpts))
        stats = sinkhorn_fused_stats(dist, jnp.asarray(0.3), 20, mask, mask,
                                     interpret=interp)
        return jnp.sum(stats["max0"])

    timed("fused_attention_bf16", attn_app)
    timed("fused_sinkhorn20", sink_app)


def bench_train_step(model, n_kpts=1024, batch=16, K=24, name="train_step"):
    """Training-step throughput: forward + backward + Adam at the reference's
    published training configuration (batch 16, 1024 max keypoints —
    config_train_megadepth.json). One jit program scans K full optimizer
    steps with device-generated batches (threefry data + an iota-built
    matching_mask), params/opt-state carried through the scan.

    Baseline assumption (STATED, not published): the reference trains batch
    16 on 4x 2080Ti (README.md:92). From the same 35 pairs/s forward
    estimate at 2000 kpts: ~4x faster forward at 1024 kpts (~140 pairs/s),
    a backward ~2x the forward => ~47 pairs/s per GPU, ~190 pairs/s on the
    4-GPU rig. vs_baseline divides by that 190."""
    import jax
    import jax.numpy as jnp

    from impx.train.step import (TrainHyperParams, make_train_step,
                                 make_optimizer, init_stats)

    REF_TRAIN_PAIRS_PER_SEC = 190.0  # 4x2080Ti estimate, see docstring

    dim = model.config.descriptor_dim
    params = model.init(jax.random.PRNGKey(0))
    hp = TrainHyperParams(lr=1e-4)
    step = make_train_step(model, hp, donate=False)
    opt_state = make_optimizer(hp).init(params)

    n = n_kpts
    half = n // 2
    i = jax.lax.broadcasted_iota(jnp.int32, (n + 1, n + 1), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (n + 1, n + 1), 1)
    # first half matched on the diagonal, second half unmatched (dustbin)
    gt = ((i == j) & (i < half)) | ((i >= half) & (i < n) & (j == n)) | \
        ((j >= half) & (j < n) & (i == n))
    gt = jnp.broadcast_to(gt.astype(jnp.float32), (batch, n + 1, n + 1))

    @jax.jit
    def run_stream(params, opt_state, seed):
        def body(carry, k):
            p, o = carry
            d = _gen_batch(seed + k, batch, n, dim, with_valid=False)
            d["matching_mask"] = gt
            p, o, metrics, _ = step(p, o, k, d, init_stats())
            return (p, o), metrics["loss"]
        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), jnp.arange(K) * 1000)
        return jnp.sum(losses)

    float(run_stream(params, opt_state, jnp.asarray(1_000_000)))
    float(run_stream(params, opt_state, jnp.asarray(9_000_000)))
    best = None
    for seed in (2_000_000, 3_000_000):
        t0 = time.perf_counter()
        float(run_stream(params, opt_state, jnp.asarray(seed)))
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    pairs_per_sec = K * batch / best
    print(json.dumps({
        "metric": f"{name}_pairs_per_sec_{n_kpts}kpt_b{batch}_1chip",
        "value": round(pairs_per_sec, 3),
        "unit": "train pairs/s (fwd+bwd+adam)",
        "vs_baseline": round(pairs_per_sec / REF_TRAIN_PAIRS_PER_SEC, 3),
    }), flush=True)
    return pairs_per_sec


def bench_train_roofline(model, n_kpts=1024, batch=16, K=24):
    """Training-step roofline (where do train_step_1024's milliseconds go,
    and how far from the MXU bound is it?). Same timing discipline as
    bench_train_step: one jit program scanning K device-generated batches,
    value readback in the timed region. Reports per-pair ms for

      fwd      forward loss only (15 supervised iterations incl. the
               per-iteration Sinkhorn+loss chain, reference gm.py
               forward_train semantics)
      grad     value_and_grad (fwd + bwd, no optimizer)
      full     the real train step (grad + Adam + LR + NaN guard)
      sink1    full step with sinkhorn_iterations=1 — the delta to `full`
               is the marginal cost of the 19 extra OT normalization
               sweeps x 15 supervised iterations

    and the MFU of the full step from XLA's compiled cost analysis against
    the chip's advertised bf16 peak (v5e: 197 TFLOP/s)."""
    import dataclasses as dc

    import jax
    import jax.numpy as jnp
    import optax

    from impx.train.step import (TrainHyperParams, make_train_step,
                                 make_optimizer, init_stats)

    dim = model.config.descriptor_dim
    params = model.init(jax.random.PRNGKey(0))
    hp = TrainHyperParams(lr=1e-4)

    n = n_kpts
    half = n // 2
    i = jax.lax.broadcasted_iota(jnp.int32, (n + 1, n + 1), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (n + 1, n + 1), 1)
    gt = ((i == j) & (i < half)) | ((i >= half) & (i < n) & (j == n)) | \
        ((j >= half) & (j < n) & (i == n))
    gt = jnp.broadcast_to(gt.astype(jnp.float32), (batch, n + 1, n + 1))

    def feed(seed, k):
        d = _gen_batch(seed + k, batch, n, dim, with_valid=False)
        d["matching_mask"] = gt
        return d

    def loss_of(m):
        def f(p, d):
            return m.forward_train(p, d, train=True)["loss"]
        return f

    def scan_prog(body):
        @jax.jit
        def run(params, opt_state, seed):
            _, out = jax.lax.scan(lambda c, k: body(c, feed(seed, k)),
                                  (params, opt_state), jnp.arange(K) * 1000)
            return jnp.sum(out)
        return run

    # fwd: loss only
    fwd_loss = loss_of(model)

    def fwd_body(carry, d):
        p, o = carry
        return (p, o), fwd_loss(p, d)

    # grad: value_and_grad, grads consumed via global norm (no optimizer)
    vg = jax.value_and_grad(fwd_loss)

    def grad_body(carry, d):
        p, o = carry
        loss, g = vg(p, d)
        return (p, o), loss + optax.global_norm(g)

    # full: the real train step
    step = make_train_step(model, hp, donate=False)
    opt_state = make_optimizer(hp).init(params)

    def full_body(carry, d):
        p, o = carry
        p, o, metrics, _ = step(p, o, jnp.zeros((), jnp.int32), d, init_stats())
        return (p, o), metrics["loss"]

    # sink1: full step, sinkhorn_iterations=1 (same param tree)
    model1 = type(model)(dc.replace(model.config, sinkhorn_iterations=1))
    step1 = make_train_step(model1, hp, donate=False)

    def sink1_body(carry, d):
        p, o = carry
        p, o, metrics, _ = step1(p, o, jnp.zeros((), jnp.int32), d, init_stats())
        return (p, o), metrics["loss"]

    def time_prog(body):
        run = scan_prog(body)
        float(run(params, opt_state, jnp.asarray(1_000_000)))
        float(run(params, opt_state, jnp.asarray(9_000_000)))
        best = None
        for seed in (2_000_000, 3_000_000):
            t0 = time.perf_counter()
            float(run(params, opt_state, jnp.asarray(seed)))
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        return best / (K * batch) * 1e3, run  # ms/pair

    ms_fwd, _ = time_prog(fwd_body)
    ms_grad, _ = time_prog(grad_body)
    ms_full, run_full = time_prog(full_body)
    ms_sink1, _ = time_prog(sink1_body)

    # MFU from an analytic matmul count (XLA's compiled cost_analysis on this
    # backend reports ~1 GFLOP/pair for a program whose projections alone are
    # >100 GFLOP — measured useless, so we count the dominant matmuls by
    # hand; elementwise/normalization traffic is excluded, which UNDERSTATES
    # the true utilization slightly):
    #   per layer application on one image (N kpts, dim D, fwd):
    #     q/k/v proj 3*2*N*D^2, attention 2*2*N^2*D, merge 2*N*D^2,
    #     MLP cat(2D)->2D->D: 2*N*(2D*2D) + 2*N*(2D*D)
    #   60 applications/pair (15 iterations x self+cross x 2 images; the
    #   shared-attention savings on 14 of 60 apps are ignored — understates),
    #   + per-iteration score matmul 2*N^2*D x 15.
    #   model-required step flops = 3x forward (fwd + 2x-fwd backward): MFU.
    #   executed flops with train_remat='full' = 4x (adds the recompute): HFU.
    N, D = n_kpts, dim
    per_app = 3 * 2 * N * D * D + 2 * 2 * N * N * D + 2 * N * D * D \
        + 2 * N * (2 * D) * (2 * D) + 2 * N * (2 * D) * D
    n_layers = model.config.n_layers
    fwd_flops = 4 * n_layers * per_app + n_layers * 2 * N * N * D
    PEAK_BF16 = 197e12  # v5e advertised bf16 peak, one chip
    mfu = (3 * fwd_flops / (ms_full * 1e-3)) / PEAK_BF16
    hfu = (4 * fwd_flops / (ms_full * 1e-3)) / PEAK_BF16
    mfu_fwd = (fwd_flops / (ms_fwd * 1e-3)) / PEAK_BF16
    print(json.dumps({
        "metric": ("train_roofline_"
                   + ("fused" if model.config.train_fused
                      else model.config.train_remat)
                   + f"_ms_per_pair_{n_kpts}kpt_b{batch}"),
        "value": round(ms_full, 3),
        "unit": (f"ms/pair full step (fwd {ms_fwd:.2f}, +bwd {ms_grad:.2f}, "
                 f"sink1 {ms_sink1:.2f}; analytic {fwd_flops / 1e9:.0f}G fwd "
                 f"per pair -> fwd MFU {100 * mfu_fwd:.0f}%, step MFU "
                 f"{100 * mfu:.0f}% / HFU {100 * hfu:.0f}% of 197T bf16 peak)"),
        "vs_baseline": 0,
    }), flush=True)
    return {"fwd": ms_fwd, "grad": ms_grad, "full": ms_full,
            "sink1": ms_sink1, "flops": fwd_flops, "mfu": mfu}


def bench_train_quality_eimp(steps=500, train_kpts=512, batch=16,
                             n_layers=15, log_every=100):
    """500-step training-quality comparison: masked EIMP vs bucket-compacted
    EIMP on the SAME synthetic data stream, seed and hyperparameters. The
    compacted trainer is a deliberately different (cheaper) objective —
    after each gather, discarded tokens leave the attention queries and the
    InstanceNorm statistics (sliced semantics, reference
    eval/matching.py:166-174) — so this run turns that caveat into a measured
    statement: the acc_corr trajectories of both trainers side by side.
    One JSON line per trainer, trajectory in the unit field."""
    import jax
    import jax.numpy as jnp
    from impx.data.megadepth import SyntheticMegadepth
    from impx.models import AdaGMN, MatcherConfig
    from impx.train.step import (TrainHyperParams, init_stats, make_optimizer,
                                 make_train_step)

    base = dataclasses.replace(
        MatcherConfig.eval_config("spp", n_layers=n_layers),
        attn_impl="pallas", compute_dtype="bfloat16", train_remat="attn",
        first_it_to_update=2, n_min_tokens=128)
    variants = {
        "masked": base,
        # half-N at it 4, quarter-N at it 8 — the training-size mirror of the
        # eval protocol-floor schedule (4:1024, 8:512, 12:256 at N=2048)
        "compact": dataclasses.replace(
            base, train_compaction=((4, train_kpts // 2),
                                    (8, train_kpts // 4))),
    }
    hp = TrainHyperParams(lr=3e-4, decay_iter=10**6, grad_clip=1.0)
    dim = base.descriptor_dim
    ds = SyntheticMegadepth(num_pairs=128, nfeatures=train_kpts,
                            desc_dim=dim, seed=0)
    batches = []
    for bi in range(8):
        samples = [ds[bi * batch + i] for i in range(batch)]
        batches.append(
            {k: jnp.asarray(np.stack([s[k] for s in samples]), jnp.float32)
             for k in samples[0] if isinstance(samples[0][k], np.ndarray)})

    # held-out batches for the COMMON eval (the in-training acc_corr of the
    # compact trainer is measured inside its own shrunken program, where the
    # token floor caps achievable matches — not comparable across variants)
    ds_eval = SyntheticMegadepth(num_pairs=64, nfeatures=train_kpts,
                                 desc_dim=dim, seed=7)
    eval_batches = []
    for bi in range(4):
        samples = [ds_eval[bi * batch + i] for i in range(batch)]
        eval_batches.append(
            {k: jnp.asarray(np.stack([s[k] for s in samples]), jnp.float32)
             for k in samples[0] if isinstance(samples[0][k], np.ndarray)})
    eval_model = AdaGMN(base)  # masked forward: one program for both variants

    @jax.jit
    def common_eval(params, data):
        out = eval_model.forward_train(params, data, train=False)
        return out["acc_corr"]

    out = {}
    for name, cfg_v in variants.items():
        model = AdaGMN(cfg_v)
        params = model.init(jax.random.PRNGKey(0))
        step = make_train_step(model, hp, donate=False)
        opt = make_optimizer(hp).init(params)
        traj = []
        acc_win = []
        for it in range(steps):
            params, opt, metrics, _ = step(params, opt, jnp.asarray(it),
                                           batches[it % len(batches)],
                                           init_stats())
            acc_win.append(float(metrics["acc_corr"]))
            if (it + 1) % log_every == 0:
                traj.append(round(float(np.mean(acc_win[-log_every:])), 1))
        eval_acc = float(np.mean([float(common_eval(params, d))
                                  for d in eval_batches]))
        out[name] = (traj, float(np.mean(acc_win[-log_every:])), eval_acc)
        print(json.dumps({
            "metric": f"train_quality_eimp_{name}_acc_corr",
            "value": round(eval_acc, 2),
            "unit": (f"correct matches/pair on 4 HELD-OUT batches through the "
                     f"common masked forward; in-trainer mean of last "
                     f"{log_every} steps {out[name][1]:.1f}, "
                     f"per-{log_every}-step trajectory {traj}"),
            "vs_baseline": 0,
        }), flush=True)
    return out


def main(selected):
    import os

    import jax

    from impx.models import MatcherConfig, DGNNS, AdaGMN

    # same honesty guard as bench.py: never report interpreter numbers
    if jax.default_backend() != "tpu" and not os.environ.get("BENCH_ALLOW_CPU"):
        raise SystemExit(
            f"bench_suite.py requires a TPU backend (got {jax.default_backend()!r}); "
            "set BENCH_ALLOW_CPU=1 to measure the interpreter anyway")
    enable_compilation_cache()

    def cfg(feature="spp", **over):
        base = MatcherConfig.eval_config(feature, n_layers=15)
        return dataclasses.replace(
            base, attn_impl="pallas", compute_dtype="bfloat16", **over)

    configs = {
        "imp_2048": lambda: bench_forward("imp", DGNNS(cfg()), 2048),
        # batch-8 probe: amortizes per-step overhead / deepens kernel
        # pipelines; if this wins, bench.py's default batch should follow
        "imp_2048_b8": lambda: bench_forward(
            "imp_b8", DGNNS(cfg()), 2048, batch=8, K=24),
        # batch-1 probe: single-pair serving latency (ms/pair = 1000/value)
        "imp_2048_b1": lambda: bench_forward(
            "imp_b1", DGNNS(cfg()), 2048, batch=1, K=96),
        "eimp_2048_masked": lambda: bench_forward(
            "eimp_masked", AdaGMN(cfg()), 2048),
        "eimp_2048_compact": lambda: bench_forward(
            "eimp_compact4_1024", AdaGMN(cfg(compaction=((4, 1024),))), 2048),
        # full protocol-floor schedule (the headline EIMP number) and an
        # earlier-start variant: compaction is exact while survivors fit the
        # buckets (overflow is reported + mask-only fallback), so an earlier
        # schedule trades only overflow risk, not silent accuracy
        "eimp_2048_compact_deep": lambda: bench_forward(
            "eimp_compact4_1024_8_512_12_256",
            AdaGMN(cfg(compaction=((4, 1024), (8, 512), (12, 256)))), 2048),
        "eimp_2048_compact_aggr": lambda: bench_forward(
            "eimp_compact3_1024_7_512_11_256",
            AdaGMN(cfg(compaction=((3, 1024), (7, 512), (11, 256)))), 2048),
        "imp_sift_2048": lambda: bench_forward(
            "imp_sift", DGNNS(cfg("sift")), 2048),
        # the log-domain OT head (fused iterated-logsumexp kernel) vs the
        # default eval-exact non-log head: the decide-with-data point for
        # which Sinkhorn head the flagship should run
        "imp_2048_logot": lambda: bench_forward(
            "imp_logot", DGNNS(cfg(log_ot=True)), 2048),
        "imp_iterative_2048": lambda: bench_iterative(
            "imp_iterative_worstcase", DGNNS(cfg()), 2048),
        "imp_iterative_trained_2048": lambda: bench_iterative_trained(
            DGNNS(cfg()), 2048),
        # wider batch amortizes the checkpoint RANSAC's tiny-op latency
        # chains (the solver work per op doubles, the op count doesn't)
        "imp_iterative_trained_2048_b16": lambda: bench_iterative_trained(
            DGNNS(cfg()), 2048, batch=16, K=3),
        "imp_iterative_trained_2048_b32": lambda: bench_iterative_trained(
            DGNNS(cfg()), 2048, batch=32, K=2),
        # 4x hypothesis budget at batch 16: steadier checkpoint poses ->
        # more pairs pass the 1.5-degree pose-diff stop -> fewer iterations;
        # tests whether accuracy buys net speed
        "imp_iterative_trained_2048_b16_h1024": lambda: bench_iterative_trained(
            DGNNS(cfg()), 2048, batch=16, K=3, num_hypotheses=1024),
        "eimp_iterative_trained_2048": lambda: (
            lambda c: bench_iterative_trained(
                AdaGMN(c), 2048, with_uncertainty=True, name="eimp",
                train_model=DGNNS(c)))(cfg()),
        "eimp_iterative_trained_2048_b16": lambda: (
            lambda c: bench_iterative_trained(
                AdaGMN(c), 2048, with_uncertainty=True, name="eimp",
                train_model=DGNNS(c), batch=16, K=3))(cfg()),
        # dynamic slot refill: device-resident queue, every slot always busy
        "imp_iterative_refill": lambda: bench_iterative_refill(
            DGNNS(cfg()), 2048, slots=16, queue_size=64),
        "imp_iterative_refill_s8": lambda: bench_iterative_refill(
            DGNNS(cfg()), 2048, slots=8, queue_size=64),
        # staged compaction: checkpoint-depth cohorts, constant weights
        "imp_iterative_staged": lambda: bench_iterative_staged(
            DGNNS(cfg()), 2048, batch=16, queue_size=64),
        "imp_iterative_staged_b8": lambda: bench_iterative_staged(
            DGNNS(cfg()), 2048, batch=8, queue_size=64),
        "imp_iterative_staged_b4": lambda: bench_iterative_staged(
            DGNNS(cfg()), 2048, batch=4, queue_size=64),
        # single-pair serving latency: trained weights, batch 1, p50/p90 ms
        "imp_iterative_b1_latency": lambda: bench_iterative_latency(
            DGNNS(cfg()), 2048),
        "scannet_spp_e2e": lambda: bench_scannet_e2e(DGNNS(cfg())),
        # CNN-only lines: decompose scannet_spp_e2e into extractor + matcher
        "superpoint_480x640": lambda: bench_superpoint(480, 640),
        "superpoint_1200x1600": lambda: bench_superpoint(
            1200, 1600, batch=2, K=12, max_keypoints=2048),
        "train_step_1024": lambda: bench_train_step(DGNNS(cfg())),
        # log-domain OT head (fused iterated-logsumexp kernel with remat VJP;
        # the bf16-preferred head) — same matcher, different score head
        "train_step_1024_logot": lambda: bench_train_step(
            DGNNS(cfg(log_ot=True)), name="train_step_logot"),
        # wider batch: amortizes per-step fixed cost, deepens kernel pipelines
        "train_step_1024_b32": lambda: bench_train_step(
            DGNNS(cfg()), batch=32, K=12, name="train_step_b32"),
        # dots-saveable remat: skip recomputing MXU work in the backward pass
        # (holds projection/Sinkhorn intermediates in HBM instead)
        "train_step_1024_dots": lambda: bench_train_step(
            DGNNS(cfg(train_remat="dots")), name="train_step_dots"),
        # named-save remat: store only the fused-attention kernel outputs
        # (skips the priciest VPU recompute in the backward)
        "train_step_1024_attn": lambda: bench_train_step(
            DGNNS(cfg(train_remat="attn")), name="train_step_attn"),
        # custom-VJP fused layers: no forward replay, saved-lse attention
        # backward, all backward matmuls in the stream dtype (bf16)
        "train_step_1024_fused": lambda: bench_train_step(
            DGNNS(cfg(train_fused=True)), name="train_step_fused"),
        # SuperGlue-style last-only supervision: one score head per step
        # instead of n_layers — both a cheaper training objective and the
        # exact ablation isolating the per-iteration dist+Sinkhorn+loss cost
        "train_step_1024_lastonly": lambda: bench_train_step(
            DGNNS(cfg(train_remat="attn", train_supervision="last")),
            name="train_step_lastonly"),
        "train_step_1024_fused_lastonly": lambda: bench_train_step(
            DGNNS(cfg(train_fused=True, train_supervision="last")),
            name="train_step_fused_lastonly"),
        # fused layers + score head OUTSIDE remat (stored dist/Sinkhorn
        # residuals instead of a per-iteration replay of the OT chain)
        "train_step_1024_fused_head": lambda: bench_train_step(
            DGNNS(cfg(train_fused=True, train_remat="attn_head")),
            name="train_step_fused_head"),
        "train_step_1024_fused_b24": lambda: bench_train_step(
            DGNNS(cfg(train_fused=True)), batch=24, K=16,
            name="train_step_fused_b24"),
        "train_step_1024_fused_b32": lambda: bench_train_step(
            DGNNS(cfg(train_fused=True)), batch=32, K=12,
            name="train_step_fused_b32"),
        # fused-layer roofline companion
        "train_roofline_fused": lambda: bench_train_roofline(
            DGNNS(cfg(train_fused=True))),
        # + score head outside the remat region (Sinkhorn custom-VJP
        # residuals stored once instead of the u/v loop replaying in bwd)
        "train_step_1024_attn_head": lambda: bench_train_step(
            DGNNS(cfg(train_remat="attn_head")), name="train_step_attn_head"),
        # union policy: attention outputs AND all MXU outputs saved — tests
        # whether the dots regression was the recompute or the residency
        "train_step_1024_attn_dots": lambda: bench_train_step(
            DGNNS(cfg(train_remat="attn_dots")), name="train_step_attn_dots"),
        # EIMP training (masked pooling in the loss loop, reference
        # adgm.py:49-325 semantics)
        "train_step_1024_eimp": lambda: bench_train_step(
            AdaGMN(cfg()), name="train_step_eimp"),
        # EIMP training with bucketed compaction: physical token gathering in
        # the training scan (half-N at it 4, quarter-N at it 8 — the training
        # mirror of the eval protocol-floor schedule)
        "train_step_1024_eimp_compact": lambda: bench_train_step(
            AdaGMN(cfg(train_compaction=((4, 512), (8, 256)),
                       train_remat="attn", first_it_to_update=2)),
            name="train_step_eimp_compact"),
        # 500-step masked-vs-compact training-quality comparison (acc_corr
        # trajectories on the same data stream/seed)
        "train_quality_eimp": lambda: bench_train_quality_eimp(),
        # kernel-level microbenchmarks (roofline evidence)
        "kernels": lambda: bench_kernels(),
        # training-step roofline: fwd/bwd/optimizer/Sinkhorn-chain split + MFU
        "train_roofline": lambda: bench_train_roofline(DGNNS(cfg())),
        # roofline under the 'attn' operating point (HFU note: executed
        # flops sit between 3x and 4x fwd — the attention recompute is
        # skipped, the rest still rematerializes)
        "train_roofline_attn": lambda: bench_train_roofline(
            DGNNS(cfg(train_remat="attn"))),
        # roofline under the custom-VJP fused layers (cfg.train_fused)
        "train_roofline_fused": lambda: bench_train_roofline(
            DGNNS(cfg(train_fused=True))),
    }
    for name in (selected or list(configs)):
        configs[name]()


if __name__ == "__main__":
    main(sys.argv[1:])
