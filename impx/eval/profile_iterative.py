"""Component profile of the fused iterative loop on the real chip.

Times each stage of an iterative checkpoint separately (attention scan,
fused Sinkhorn, match extraction, 5-point RANSAC, 8-point RANSAC, IRLS
refit, cheirality decomposition, full-match rescoring) with the bench.py
honest-timing discipline: K distinct device-generated inputs per jit
program, scalar readback, warm runs first. Prints one JSON line per stage.

Usage: python -m impx.eval.profile_iterative [--batch 8] [--kpts 2048]
"""
from __future__ import annotations

import argparse
import json
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--kpts", type=int, default=2048)
    ap.add_argument("--hyp", type=int, default=256)
    ap.add_argument("--bucket", type=int, default=512)
    ap.add_argument("--K", type=int, default=24, help="repeats per timed program")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from impx.models import MatcherConfig, DGNNS
    from impx.models.fast import stack_params, _attn_block
    from impx.ops.attention import _interpret
    from impx.ops.matching import matches_from_stats
    from impx.ops.pallas.sinkhorn import sinkhorn_fused_stats
    from impx.ransac.pose_solver import estimate_pose_from_matches
    from impx.ransac.ransac import estimate_essential_ransac
    from impx.ransac.five_point import solve_essential_5pt
    from impx.ransac.eight_point import essential_from_points

    b, n, K = args.batch, args.kpts, args.K
    interp = _interpret()
    cfg = MatcherConfig.eval_config("spp", n_layers=15)
    import dataclasses

    cfg = dataclasses.replace(cfg, attn_impl="pallas", compute_dtype="bfloat16")
    model = DGNNS(cfg)
    params = model.init(jax.random.PRNGKey(0))
    stacked = stack_params(params, cfg)

    def timed(name, fn, per_call_items=1.0):
        f = jax.jit(fn)
        float(f(jnp.asarray(1_000_000)))
        float(f(jnp.asarray(9_000_000)))
        best = None
        for seed in (2_000_000, 3_000_000):
            t0 = time.perf_counter()
            float(f(jnp.asarray(seed)))
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        ms = best / K * 1000.0
        print(json.dumps({"metric": f"prof_{name}_ms",
                          "value": round(ms, 3),
                          "unit": f"ms per call (b={b})",
                          "vs_baseline": 0}), flush=True)
        return ms

    def rkeys(seed, k, num):
        return jax.random.split(jax.random.fold_in(jax.random.PRNGKey(0), seed + k), num)

    # ---- attention: one self+cross iteration on the stacked batch ---------
    def attn_stream(seed):
        h, dh = cfg.num_heads, cfg.descriptor_dim // cfg.num_heads
        def body(acc, k):
            ks = rkeys(seed, k, 2)
            desc = jax.random.normal(ks[0], (2 * b, n, cfg.descriptor_dim),
                                     jnp.bfloat16)
            qk = {"q": jnp.zeros((2 * b, h, n, dh), jnp.bfloat16),
                  "k": jnp.zeros((2 * b, h, n, dh), jnp.bfloat16)}
            mask = jnp.ones((2 * b, n), bool)
            L = jax.tree.map(lambda x: x[0], stacked["self"])
            delta, qk = _attn_block(L, desc, desc, qk, mask, mask,
                                    h, cfg.ac_fn, jnp.bfloat16, interp)
            d2 = desc + delta
            delta2, _ = _attn_block(jax.tree.map(lambda x: x[0], stacked["cross"]),
                                    d2, jnp.roll(d2, b, 0), qk, mask, mask,
                                    h, cfg.ac_fn, jnp.bfloat16, interp)
            return acc + jnp.sum((delta2[0, 0, :8]).astype(jnp.float32)), None
        return jax.lax.scan(body, jnp.zeros(()), jnp.arange(K))[0]

    # ---- fused Sinkhorn head at full bucket --------------------------------
    def sink_stream(seed):
        def body(acc, k):
            ks = rkeys(seed, k, 1)
            dist = jax.random.normal(ks[0], (b, n, n), jnp.float32)
            st = sinkhorn_fused_stats(dist, stacked["bin_score"], 20,
                                      interpret=interp)
            return acc + jnp.sum(st["max0"][:, :8]), None
        return jax.lax.scan(body, jnp.zeros(()), jnp.arange(K))[0]

    # ---- match extraction tail --------------------------------------------
    def match_stream(seed):
        def body(acc, k):
            ks = rkeys(seed, k, 3)
            max0 = jax.random.uniform(ks[0], (b, n))
            idx0 = jax.random.randint(ks[1], (b, n), 0, n)
            idx1 = jax.random.randint(ks[2], (b, n), 0, n)
            i0, _, ms0, _ = matches_from_stats(max0, idx0, idx1, 0.1)
            return acc + jnp.sum(ms0[:, :8]), None
        return jax.lax.scan(body, jnp.zeros(()), jnp.arange(K))[0]

    # ---- full checkpoint pose (match-compacted weighted 5pt RANSAC) -------
    def _fake_matches(ks):
        x0n = jax.random.normal(ks[0], (b, n, 2)) * 0.3
        x1n = jax.random.normal(ks[1], (b, n, 2)) * 0.3
        idx0 = jnp.where(jax.random.uniform(ks[2], (b, n)) < 0.25,
                         jax.random.randint(ks[3], (b, n), 0, n), -1)
        ms0 = jax.random.uniform(ks[4], (b, n))
        return x0n, x1n, idx0, ms0

    def pose_stream_5pt(seed):
        def body(acc, k):
            ks = rkeys(seed, k, 6)
            x0n, x1n, idx0, ms0 = _fake_matches(ks)
            pk = jax.random.split(ks[5], b)
            out = jax.vmap(lambda kk, a, bb, i0, ms: estimate_pose_from_matches(
                kk, a, bb, i0, ms, 2e-3, bucket=args.bucket,
                num_hypotheses=args.hyp, sample_size=5))(pk, x0n, x1n, idx0, ms0)
            return acc + jnp.sum(out["t"]), None
        return jax.lax.scan(body, jnp.zeros(()), jnp.arange(K))[0]

    def pose_stream_8pt(seed):
        def body(acc, k):
            ks = rkeys(seed, k, 6)
            x0n, x1n, idx0, ms0 = _fake_matches(ks)
            pk = jax.random.split(ks[5], b)
            out = jax.vmap(lambda kk, a, bb, i0, ms: estimate_pose_from_matches(
                kk, a, bb, i0, ms, 2e-3, bucket=args.bucket,
                num_hypotheses=args.hyp, sample_size=8))(pk, x0n, x1n, idx0, ms0)
            return acc + jnp.sum(out["t"]), None
        return jax.lax.scan(body, jnp.zeros(()), jnp.arange(K))[0]

    # ---- minimal solvers alone --------------------------------------------
    def solver5_stream(seed):
        def body(acc, k):
            ks = rkeys(seed, k, 2)
            sx0 = jax.random.normal(ks[0], (b, args.hyp, 5, 2)) * 0.3
            sx1 = jax.random.normal(ks[1], (b, args.hyp, 5, 2)) * 0.3
            Es, ok = jax.vmap(solve_essential_5pt)(sx0, sx1)
            return acc + jnp.sum(Es[:, :2, :2]), None
        return jax.lax.scan(body, jnp.zeros(()), jnp.arange(K))[0]

    def solver8_stream(seed):
        def body(acc, k):
            ks = rkeys(seed, k, 2)
            sx0 = jax.random.normal(ks[0], (b, args.hyp, 8, 2)) * 0.3
            sx1 = jax.random.normal(ks[1], (b, args.hyp, 8, 2)) * 0.3
            Es = jax.vmap(lambda a, c: essential_from_points(a, c, project=False))(
                sx0, sx1)
            return acc + jnp.sum(Es[:, :2, :2]), None
        return jax.lax.scan(body, jnp.zeros(()), jnp.arange(K))[0]

    # ---- raw RANSAC on compacted points (no decomposition/rescoring) ------
    def ransac_stream(seed):
        def body(acc, k):
            ks = rkeys(seed, k, 4)
            mx0 = jax.random.normal(ks[0], (b, args.bucket, 2)) * 0.3
            mx1 = jax.random.normal(ks[1], (b, args.bucket, 2)) * 0.3
            w = jax.random.uniform(ks[2], (b, args.bucket))
            pk = jax.random.split(ks[3], b)
            out = jax.vmap(lambda kk, a, c, ww: estimate_essential_ransac(
                kk, a, c, jnp.ones((args.bucket,), bool), 2e-3,
                num_hypotheses=args.hyp, sample_size=5, weights=ww))(
                    pk, mx0, mx1, w)
            return acc + jnp.sum(out["E"][:, 0]), None
        return jax.lax.scan(body, jnp.zeros(()), jnp.arange(K))[0]

    timed("attn_self_cross_iter", attn_stream)
    timed("sinkhorn_head", sink_stream)
    timed("match_extract", match_stream)
    timed("solver5pt_only", solver5_stream)
    timed("solver8pt_only", solver8_stream)
    timed("ransac5pt_compacted", ransac_stream)
    timed("checkpoint_pose_5pt", pose_stream_5pt)
    timed("checkpoint_pose_8pt", pose_stream_8pt)


if __name__ == "__main__":
    main()
