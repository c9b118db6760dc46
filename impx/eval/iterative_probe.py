"""Large-sample quality probe of the trained iterative loop over a
noise / overlap grid.

Round-3 verdict: the trained-iterative quality claim rode on 48 synthetic
pairs — one pair swung the convergence estimate by ~2%. This probe runs the
SAME fused loop + trained weights over 200+ device-generated pairs spanning a
grid of pixel noise (geometry difficulty for the checkpoint RANSAC) and
effective inlier fraction (overlap difficulty for the matcher), reporting
per-cell convergence rate, median pose error, mean stop iteration, and the
aggregate stop-iteration histogram (the reference prints exactly this
histogram per run, eval/eval_imp.py:213-227).

Overlap is varied WITHOUT recompiling: scenes are generated at a fixed
50% correspondence budget and a traced `corrupt_frac` of the correspondence
block gets its image-1 descriptors replaced by independent noise — those
keypoints stop being findable matches, which is exactly what lower image
overlap does to a matcher. One compiled program serves every grid cell.

Usage: python -m impx.eval.iterative_probe [--pairs-per-cell 24] [--cpu]
(TPU by default; --cpu runs a reduced smoke on the interpreter-free XLA CPU.)
"""
from __future__ import annotations

import argparse
import json
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs-per-cell", type=int, default=24)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--kpts", type=int, default=2048)
    ap.add_argument("--hypotheses", type=int, default=256)
    ap.add_argument("--pixel-noise", type=float, nargs="+",
                    default=[0.5, 1.0, 2.0])
    ap.add_argument("--corrupt-frac", type=float, nargs="+",
                    default=[0.0, 0.4, 0.7],
                    help="fraction of the 50%%-correspondence budget whose "
                         "descriptors are decorrelated -> effective inlier "
                         "fractions 0.5/0.3/0.15")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--train-steps", type=int, default=500)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    import bench_suite  # repo root on sys.path (run from the repo)
    from impx.data.synthetic_device import synthesize_feed_device
    from impx.eval.iterative_fused import iterative_fused_batched
    from impx.geometry.pose import compute_pose_error_np
    from impx.models import MatcherConfig, DGNNS
    from impx.models.fast import stack_params

    if not args.cpu:
        bench_suite.enable_compilation_cache()

    import dataclasses

    cfg = dataclasses.replace(
        MatcherConfig.eval_config("spp", n_layers=15),
        attn_impl="xla" if args.cpu else "pallas",
        compute_dtype="bfloat16")
    model = DGNNS(cfg)
    params, _ = bench_suite._trained_matcher_params(
        model, train_steps=args.train_steps)
    stacked = stack_params(params, model.config)

    batch, n, dim = args.batch, args.kpts, cfg.descriptor_dim
    nts = jnp.full((batch,), 2e-3, jnp.float32)

    @jax.jit
    def probe(stacked, seed, key, pixel_noise, corrupt_frac):
        gk = jax.random.fold_in(jax.random.PRNGKey(11), seed)
        d, R_gt, t_gt = synthesize_feed_device(
            gk, batch, n, dim, inlier_frac=0.5, pixel_noise=pixel_noise)
        # decorrelate a traced fraction of the correspondence block: those
        # keypoints keep valid geometry but stop being findable matches
        n_in = n // 2
        ck = jax.random.split(gk, 2)
        corrupt = jax.random.uniform(ck[0], (batch, n_in)) < corrupt_frac
        fresh = jax.random.normal(ck[1], (batch, n_in, dim))
        fresh = fresh / (jnp.linalg.norm(fresh, axis=-1, keepdims=True) + 1e-12)
        d1 = d["descriptors1"]
        d["descriptors1"] = jnp.concatenate([
            jnp.where(corrupt[..., None], fresh, d1[:, :n_in]),
            d1[:, n_in:]], axis=1)
        layer_keys = jnp.tile(key[None, :], (model.config.n_layers, 1))
        out = iterative_fused_batched(
            model, stacked, d, layer_keys, nts,
            num_hypotheses=args.hypotheses)
        return out["converged"], out["stopped_at"], out["R"], out["t"], R_gt, t_gt

    steps = max(args.pairs_per_cell // batch, 1)
    all_stops, rows = [], []
    seed0 = 0
    for pn in args.pixel_noise:
        for cf in args.corrupt_frac:
            conv_l, stop_l, errs = [], [], []
            for s in range(steps):
                seed0 += 1
                key = jax.random.fold_in(jax.random.PRNGKey(5), seed0)
                c, st, Re, te, Rg, tg = probe(
                    stacked, jnp.asarray(seed0 * 211),
                    key, jnp.asarray(pn, jnp.float32),
                    jnp.asarray(cf, jnp.float32))
                conv_l.append(np.asarray(c))
                stop_l.append(np.asarray(st))
                Re, te, Rg, tg = map(np.asarray, (Re, te, Rg, tg))
                for bi in range(batch):
                    T = np.eye(4)
                    T[:3, :3] = Rg[bi]
                    T[:3, 3] = tg[bi]
                    err_t, err_R = compute_pose_error_np(T, Re[bi], te[bi])
                    errs.append(max(err_R, err_t))
            conv = np.concatenate(conv_l)
            stops = np.concatenate(stop_l)
            all_stops.append(stops)
            errs = np.asarray(errs)
            rows.append({
                "pixel_noise": pn,
                "inlier_frac_eff": round(0.5 * (1 - cf), 3),
                "pairs": int(conv.size),
                "converged_pct": round(100 * float(conv.mean()), 1),
                "median_err_deg": round(float(np.median(errs)), 2),
                "median_err_conv_deg": (
                    round(float(np.median(errs[conv])), 2)
                    if conv.any() else None),
                "mean_stop": round(float(stops.mean()), 1),
            })
            print(json.dumps(rows[-1]), flush=True)

    stops = np.concatenate(all_stops)
    u, c = np.unique(stops, return_counts=True)
    total = int(stops.size)
    conv_total = sum(r["converged_pct"] * r["pairs"] for r in rows) / (100 * total)
    print(f"\n=== iterative probe: {total} pairs, "
          f"{100 * conv_total:.1f}% converged overall ===", file=sys.stderr)
    print("stop-iteration histogram (reference eval_imp.py:213-227 format):",
          file=sys.stderr)
    for k, v in zip(u, c):
        print(f"  stop {int(k):2d}: {int(v):4d} ({100 * v / total:.1f}%)",
              file=sys.stderr, flush=True)
    return rows


if __name__ == "__main__":
    main()
