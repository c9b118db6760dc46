"""Geo-supervision study: does the pose-consistency loss help?

Trains two identical small DGNNS matchers on the same synthetic stream —
one with only the matching NLL (reference nets/loss.py GraphLoss), one with
the added geometry (epipolar) term (--with_geo; the training recipe behind
the reference's `_geo` weight variants, eval/eval_imp.py:275/316) — then
evaluates both through the real eval driver (impx/eval/eval_imp.py:evaluate)
on held-out synthetic scenes and prints pose AUC / precision side by side.

Descriptor noise is set high so appearance alone is ambiguous: geometry
supervision has something to disambiguate (the regime the IMP paper targets).

Usage: python -m impx.eval.geo_study [--steps 400] [--fast]
"""
from __future__ import annotations

import argparse
import dataclasses

import numpy as np

parser = argparse.ArgumentParser()
parser.add_argument("--steps", type=int, default=400)
parser.add_argument("--batch", type=int, default=8)
parser.add_argument("--nfeat", type=int, default=192)
parser.add_argument("--desc_dim", type=int, default=64)
parser.add_argument("--desc_noise", type=float, default=0.55)
parser.add_argument("--eval_pairs", type=int, default=32)
parser.add_argument("--geo_weight", type=float, default=50.0)
parser.add_argument("--fast", action="store_true", help="tiny CI-sized run")
parser.add_argument("--seed", type=int, default=0)
parser.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (model is tiny; avoids the "
                         "TPU relay's per-dispatch latency)")


def _train_batch(rs, args):
    import jax.numpy as jnp

    from impx.data.synthetic import training_sample

    samples = [training_sample(rs, nfeatures=args.nfeat, desc_dim=args.desc_dim,
                               desc_noise=args.desc_noise)
               for _ in range(args.batch)]
    return {k: jnp.asarray(np.stack([s[k] for s in samples]).astype(np.float32))
            for k in samples[0] if isinstance(samples[0][k], np.ndarray)}


def _train(model, args, seed):
    import jax
    import jax.numpy as jnp

    from impx.train.step import (TrainHyperParams, init_stats, make_optimizer,
                                 make_train_step)

    params = model.init(jax.random.PRNGKey(seed))
    hp = TrainHyperParams(lr=1e-3, decay_iter=10**6)
    step = make_train_step(model, hp, donate=False)
    opt = make_optimizer(hp).init(params)
    rs = np.random.RandomState(seed + 1)
    last = {}
    for it in range(args.steps):
        batch = _train_batch(rs, args)
        params, opt, metrics, _ = step(params, opt, jnp.asarray(it), batch,
                                       init_stats())
        if (it + 1) % max(args.steps // 4, 1) == 0:
            last = {k: float(metrics[k]) for k in
                    ("loss", "matching_loss", "geo_loss", "acc_corr")}
            print(f"  step {it + 1}: {last}", flush=True)
    return params


def _evaluate(model, params, args, tmpdir):
    import os

    from impx.data.reader import StandardReader
    from impx.data.synthetic import write_eval_hdf5
    from impx.eval.eval_imp import evaluate

    ds_path = os.path.join(tmpdir, "geo_eval.hdf5")
    if not os.path.exists(ds_path):
        write_eval_hdf5(ds_path, num_pairs=args.eval_pairs, seed=args.seed + 99,
                        n_inliers=args.nfeat // 2, n_outliers0=args.nfeat,
                        n_outliers1=args.nfeat, desc_dim=args.desc_dim,
                        desc_noise=args.desc_noise)
    reader = StandardReader({"rawdata_dir": tmpdir, "dataset_dir": ds_path,
                             "num_kpt": args.nfeat})

    class Args:
        use_iterative = False
        use_uncertainty = False
        pose_backend = "jax"
        max_pairs = args.eval_pairs
        bucket = ((args.nfeat + 127) // 128) * 128
        eval_batch = 8
        data_parallel = False

    return evaluate(model, params, reader, error_th=1.0,
                    eval_config={"rescale": 640, "inlier_th": 0.005},
                    args=Args())


def main(argv=None):
    import tempfile

    args = parser.parse_args(argv)
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from impx.models import DGNNS, MatcherConfig
    if args.fast:
        args.steps, args.eval_pairs, args.nfeat = 60, 8, 96

    base = MatcherConfig(descriptor_dim=args.desc_dim, keypoint_encoder=(16, 32),
                         n_layers=3, sinkhorn_iterations=10, norm_fn="in")
    rows = []
    with tempfile.TemporaryDirectory() as tmpdir:
        for name, cfg in (
            ("matching-only", base),
            ("with_geo", dataclasses.replace(base, with_geo=True,
                                             geo_weight=args.geo_weight)),
        ):
            print(f"training {name} ({args.steps} steps)...", flush=True)
            model = DGNNS(cfg)
            params = _train(model, args, seed=args.seed)
            res = _evaluate(model, params, args, tmpdir)
            rows.append((name, res))
            print(f"  {name}: auc {res['auc']} prec {res['precision']:.2f} "
                  f"mscore {res['matching_score']:.2f}", flush=True)

    print("\n| model | AUC@5 | AUC@10 | AUC@20 | precision |")
    print("|---|---|---|---|---|")
    for name, res in rows:
        a = res["auc"]
        print(f"| {name} | {a[5]:.1f} | {a[10]:.1f} | {a[20]:.1f} | "
              f"{res['precision']:.1f} |")
    return rows


if __name__ == "__main__":
    main()
