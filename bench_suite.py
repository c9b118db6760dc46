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


def bench_iterative_trained(model, n_kpts=2048, batch=8, K=6, train_kpts=512,
                            train_steps=500, num_hypotheses=256,
                            valid_its=None, eval_inlier_frac=0.25,
                            min_kpts=25, pose_stop_deg=1.5,
                            with_uncertainty=False, name="imp",
                            train_model=None):
    """Iterative loop with TRAINED weights on matchable synthetic pairs: the
    early-stop case (converged pairs flip the whole scan to the identity
    branch). This is the deployment-relevant number — the worst-case config
    (random weights, never converges) is the floor. Also reports convergence
    fraction, mean stopping iteration and median pose error vs ground truth
    so the speed is tied to demonstrated quality."""
    import jax
    import jax.numpy as jnp
    from impx.data.megadepth import SyntheticMegadepth
    from impx.data.synthetic import synthesize_pair
    from impx.eval.iterative_fused import iterative_fused_batched
    from impx.geometry.pose import compute_pose_error_np
    from impx.models.fast import stack_params
    from impx.train.step import (TrainHyperParams, init_stats, make_optimizer,
                                 make_train_step)

    dim = model.config.descriptor_dim

    # -------- train briefly on synthetic matchable scenes (rotating batches)
    # train_model: e.g. train DGNNS on the differentiable scan fast path and
    # bench the SAME weights under AdaGMN's uncertainty pooling (identical
    # parameter structure; EIMP is IMP + pooling, reference adgm.py:15)
    tm = train_model if train_model is not None else model
    # The training recipe is identical across the iterative configs (always
    # the DGNNS scan fast path at the same dim/kpts/steps), so the trained
    # weights are cached on disk — re-runs and the EIMP variant skip the
    # 500-step warm-up entirely (weights/cache/ is gitignored).
    import os
    cache_fn = os.path.join(
        "weights", "cache",
        f"bench_it_{type(tm).__name__}_{dim}_{train_kpts}_{train_steps}.npy")
    acc_corr = None
    if os.path.isfile(cache_fn):
        blob = np.load(cache_fn, allow_pickle=True).item()
        treedef = jax.tree.structure(tm.init(jax.random.PRNGKey(0)))
        params = jax.tree.unflatten(
            treedef, [jnp.asarray(x) for x in blob["leaves"]])
        acc_corr = blob["acc_corr"]
        print(f"[train] cached weights {cache_fn}", file=sys.stderr, flush=True)
    else:
        params = tm.init(jax.random.PRNGKey(0))
        # deep (15-layer) matcher from scratch: clip grads and keep lr
        # moderate or the first steps blow up and the NaN guard no-ops
        hp = TrainHyperParams(lr=3e-4, decay_iter=10**6, grad_clip=1.0)
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
        np.save(cache_fn, {"leaves": [np.asarray(x) for x in leaves],
                           "acc_corr": acc_corr}, allow_pickle=True)
    print(json.dumps({"metric": "iterative_trained_train_acc_corr",
                      "value": round(float(acc_corr), 2),
                      "unit": f"correct matches/pair after {train_steps} steps",
                      "vs_baseline": 0}), flush=True)

    # -------- matchable eval stream at the full keypoint budget
    from impx.data.synthetic import eval_feed_from_pair

    def eval_stack(seed):
        rs = np.random.RandomState(seed)
        feeds, poses = [], []
        for _ in range(K * batch):
            n_in = int(n_kpts * eval_inlier_frac)
            pair = synthesize_pair(rs, n_inliers=n_in,
                                   n_outliers0=n_kpts - n_in,
                                   n_outliers1=n_kpts - n_in,
                                   desc_dim=dim, image_size=(480, 640))
            feeds.append(eval_feed_from_pair(pair, n_kpts))
            poses.append((pair["R"], pair["T"]))
        stack = {k: jnp.asarray(
            np.stack([f[k] for f in feeds]).reshape(
                K, batch, *feeds[0][k].shape).astype(
                    np.bool_ if feeds[0][k].dtype == np.bool_ else np.float32))
            for k in feeds[0]}
        return stack, poses

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

    @jax.jit
    def run_stream(stacked, stack, keys, shift):
        # `shift` rotates which batch each scan step consumes: per-run
        # variation (defeats the relay result cache) without re-uploading
        # or re-materializing the host-built geometry
        def body(acc, xs):
            k, key = xs
            d = jax.tree.map(lambda v: v[(k + shift) % K], stack)
            out = run_one(stacked, d, key)
            return acc + jnp.sum(out["mscores0"]) + jnp.sum(out["stopped_at"]), None
        return jax.lax.scan(body, jnp.zeros(()),
                            (jnp.arange(K), keys))[0]

    @jax.jit
    def touch(stack):
        return sum(jnp.sum(v.astype(jnp.float32)) for v in stack.values())

    # quality probe (untimed): convergence fraction, stop iteration, pose err
    # over ALL K*batch pairs (a single batch of 8 made the converged-fraction
    # a 1-in-8-quantized statistic that swung run to run)
    stack_q, poses_q = eval_stack(1)
    run_one_j = jax.jit(run_one)
    conv_l, stops_l, errs = [], [], []
    for k in range(K):
        dk = {key_: v[k] for key_, v in stack_q.items()}
        out = run_one_j(stacked, dk, keys[k])
        conv_l.append(np.asarray(out["converged"]))
        stops_l.append(np.asarray(out["stopped_at"]))
        for bi in range(batch):
            T_0to1 = np.eye(4)
            T_0to1[:3, :3] = poses_q[k * batch + bi][0]
            T_0to1[:3, 3] = poses_q[k * batch + bi][1]
            err_t, err_R = compute_pose_error_np(
                T_0to1, np.asarray(out["R"][bi]), np.asarray(out["t"][bi]))
            errs.append(max(err_R, err_t))
    conv = np.concatenate(conv_l)
    stops = np.concatenate(stops_l)
    print(json.dumps({"metric": "iterative_trained_quality",
                      "value": round(float(np.median(errs)), 2),
                      "unit": f"median pose err deg; converged {conv.mean():.2f}; "
                              f"mean stop {stops.mean():.1f}/{model.config.n_layers}",
                      "vs_baseline": 0}), flush=True)

    float(touch(stack_q))  # force the one upload before timing
    float(run_stream(stacked, stack_q, keys, jnp.asarray(0)))  # compile + warm
    best = None
    for shift in (1, 2):
        t0 = time.perf_counter()
        float(run_stream(stacked, stack_q, keys, jnp.asarray(shift)))
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
        "scannet_spp_e2e": lambda: bench_scannet_e2e(DGNNS(cfg())),
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
        # EIMP training (masked pooling in the loss loop, reference
        # adgm.py:49-325 semantics)
        "train_step_1024_eimp": lambda: bench_train_step(
            AdaGMN(cfg()), name="train_step_eimp"),
        # kernel-level microbenchmarks (roofline evidence)
        "kernels": lambda: bench_kernels(),
    }
    for name in (selected or list(configs)):
        configs[name]()


if __name__ == "__main__":
    main(sys.argv[1:])
