"""Training launcher CLI.

Mirrors reference train.py semantics: argparse defaults overridden by a flat
JSON config (--config; JSON wins over defaults, later CLI flags win again),
model selection by name gm/dgnns/adagmn, optional pretrained/resume weights.
The reference spawns one NCCL process per GPU (train.py:142); here a single
process jit-shards the step over all local chips (multi-host: initialize
jax.distributed before launch).

Usage:
  python -m impx.train.train --config configs/config_train_megadepth.json
  python -m impx.train.train --synthetic --epochs 2 --its_per_epoch 10  # smoke
"""
from __future__ import annotations

import argparse
import json
import os.path as osp

parser = argparse.ArgumentParser(description="IMP training (TPU)",
                                 formatter_class=argparse.ArgumentDefaultsHelpFormatter)
parser.add_argument("--config", type=str, default=None, help="flat JSON overriding defaults")
parser.add_argument("--network", type=str, default="gm", choices=["gm", "dgnns", "adagmn"])
parser.add_argument("--feature", choices=["sift", "spp"], default="spp")
parser.add_argument("--max_keypoints", type=int, default=512)
parser.add_argument("--layers", type=int, default=9)
parser.add_argument("--sinkhorn_iterations", type=int, default=20)
parser.add_argument("--match_th", type=float, default=0.2)
parser.add_argument("--with_sinkhorn", type=int, default=1)
parser.add_argument("--ac_fn", type=str, default="relu")
parser.add_argument("--norm_fn", type=str, default="in")
parser.add_argument("--n_min_tokens", type=int, default=256)
parser.add_argument("--lr", type=float, default=1e-4)
parser.add_argument("--min_lr", type=float, default=1e-6)
parser.add_argument("--decay_rate", type=float, default=0.999992)
parser.add_argument("--decay_iter", type=int, default=200_000)
parser.add_argument("--weight_decay", type=float, default=5e-4)
parser.add_argument("--optim", type=str, default="adam", choices=["adam", "adamw"])
parser.add_argument("--epochs", type=int, default=20)
parser.add_argument("--batch_size", type=int, default=16)
parser.add_argument("--its_per_epoch", type=int, default=-1)
parser.add_argument("--log_intervals", type=int, default=50)
parser.add_argument("--save_path", type=str, default="runs")
parser.add_argument("--base_path", type=str, default=None, help="MegaDepth dump root")
parser.add_argument("--scene_list_fn", type=str, default=None)
parser.add_argument("--pairs_per_scene", type=int, default=80)
parser.add_argument("--min_inliers", type=int, default=32)
parser.add_argument("--max_inliers", type=int, default=512)
parser.add_argument("--random_inliers", type=int, default=0)
parser.add_argument("--weight_path", type=str, default="None")
parser.add_argument("--resume_path", type=str, default="None")
parser.add_argument("--save_root", type=str, default=".")
parser.add_argument("--synthetic", action="store_true",
                    help="train on the synthetic scene generator (no dump needed)")
parser.add_argument("--synthetic_pairs", type=int, default=512)
parser.add_argument("--compute_dtype", type=str, default="float32",
                    choices=["float32", "bfloat16"])
parser.add_argument("--with_geo", action="store_true",
                    help="add the pose-consistency (epipolar) loss term — "
                         "trains the _geo weight variants "
                         "(reference eval/eval_imp.py:275/316 weight tables)")
parser.add_argument("--geo_weight", type=float, default=50.0)
parser.add_argument("--geo_clamp", type=float, default=0.05)
parser.add_argument("--attn_impl", type=str, default="xla",
                    choices=["xla", "pallas"],
                    help="'pallas' routes training through the fused-kernel "
                         "scan fast path (requires norm_fn=in)")
parser.add_argument("--log_ot", action="store_true",
                    help="log-domain optimal-transport score head "
                         "(superglue.py:180-209 semantics; the preferred "
                         "head for bf16 training)")
parser.add_argument("--train_remat", type=str, default="full",
                    choices=["full", "dots", "attn", "attn_head", "attn_dots",
                             "none"],
                    help="remat policy for the training layer scan "
                         "(see MatcherConfig.train_remat)")
parser.add_argument("--train_fused", action="store_true",
                    help="custom-VJP fused training layers (fastest; "
                         "supersedes --train_remat for the layer part; "
                         "requires --attn_impl pallas + norm_fn=in — see "
                         "MatcherConfig.train_fused)")
parser.add_argument("--train_supervision", type=str, default="all",
                    choices=["all", "last"],
                    help="'all' = per-iteration supervision (the reference "
                         "objective, gms.py:48-137); 'last' = SuperGlue-style "
                         "final-iteration-only loss (one score head per step "
                         "— cheaper)")
parser.add_argument("--train_compaction", type=str, default="",
                    help="EIMP training bucket-compaction schedule "
                         "'it:bucket,it:bucket,...' (adagmn only; physically "
                         "drops pooled tokens during training — sliced "
                         "semantics, real FLOP savings; '' = the reference's "
                         "masked trainer)")
parser.add_argument("--attn_block_q", type=int, default=0,
                    help="fused-attention q-block override (0 = automatic: "
                         "full-N single block when max_keypoints <= 1024, "
                         "kernel default 256 otherwise)")
parser.add_argument("--multihost", action="store_true",
                    help="initialize jax.distributed (multi-host mesh over DCN; "
                         "the data mesh then spans all hosts' chips)")
parser.add_argument("--model_parallel", type=int, default=1,
                    help=">1 trains over a 2-D (data, model) mesh with "
                         "Megatron-style tensor-parallel param shardings "
                         "(impx/parallel/tp.py); must divide the local device "
                         "count, and batch_size must remain divisible by the "
                         "data-axis size")


def build_model(args):
    from impx.eval.eval_imp import parse_compaction
    from impx.models import MatcherConfig, GM, DGNNS, AdaGMN

    cfg = MatcherConfig(
        descriptor_dim=256 if args.feature == "spp" else 128,
        n_layers=args.layers,
        sinkhorn_iterations=args.sinkhorn_iterations,
        match_threshold=args.match_th,
        with_sinkhorn=args.with_sinkhorn > 0,
        ac_fn=args.ac_fn,
        norm_fn=args.norm_fn,
        n_min_tokens=args.n_min_tokens,
        compute_dtype=args.compute_dtype,
        with_geo=args.with_geo,
        geo_weight=args.geo_weight,
        geo_clamp=args.geo_clamp,
        attn_impl=args.attn_impl,
        log_ot=args.log_ot,
        train_remat=args.train_remat,
        train_fused=args.train_fused,
        train_supervision=args.train_supervision,
        attn_block_q=args.attn_block_q or None,
        train_compaction=parse_compaction(args.train_compaction),
    )
    return {"gm": GM, "dgnns": DGNNS, "adagmn": AdaGMN}[args.network](cfg)


def build_dataset(args):
    if args.synthetic or args.base_path is None:
        from impx.data.megadepth import SyntheticMegadepth

        return SyntheticMegadepth(
            num_pairs=args.synthetic_pairs, nfeatures=args.max_keypoints,
            desc_dim=256 if args.feature == "spp" else 128)
    from impx.data.megadepth import Megadepth

    return Megadepth(
        base_path=args.base_path, scene_list_fn=args.scene_list_fn,
        pairs_per_scene=args.pairs_per_scene, nfeatures=args.max_keypoints,
        feature_type=args.feature, train=True,
        min_inliers=args.min_inliers, max_inliers=args.max_inliers,
        random_inliers=args.random_inliers > 0)


def main(argv=None):
    import jax

    from impx.tools.compile_cache import enable as enable_compile_cache

    enable_compile_cache()  # cold-start: train-step compiles reload in seconds
    args = parser.parse_args(argv)
    if getattr(args, "multihost", False):
        # coordinator/process env comes from the launcher (TPU pods set it);
        # replaces the reference's hardcoded localhost NCCL init (train.py:49-53)
        jax.distributed.initialize()
    if args.config:
        # JSON overrides defaults, explicit CLI flags override JSON
        # (reference train.py:95-101 merge order)
        with open(args.config) as f:
            overrides = json.load(f)
        ns = argparse.Namespace()
        ns.__dict__.update(vars(parser.parse_args([])))
        ns.__dict__.update({k: v for k, v in overrides.items() if not k.endswith("_")})
        args = parser.parse_args(argv, namespace=ns)

    from impx.train.trainer import Trainer

    model = build_model(args)
    dataset = build_dataset(args)
    trainer = Trainer(model, dataset, args)

    params = model.init(jax.random.PRNGKey(0))
    opt_state = None
    if args.weight_path != "None":
        from impx.tools.convert_torch import load_matcher_checkpoint

        params = load_matcher_checkpoint(
            osp.join(args.save_root, args.weight_path), model.config, model.sharing)
        print(f"Loaded pretrained weights from {args.weight_path}")
    if args.resume_path != "None":
        opt_state = trainer.tx.init(params)
        params, opt_state = trainer.restore_checkpoint(
            osp.join(args.save_root, args.resume_path), params, opt_state)
        print(f"Resumed from {args.resume_path} at epoch {trainer.epoch}")

    trainer.train(params, opt_state)


if __name__ == "__main__":
    main()
