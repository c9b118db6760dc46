"""Main eval CLI — reference-compatible semantics (eval/eval_imp.py).

Usage:
  python -m impx.eval.eval_imp --matching_method IMP --dataset yfcc \
      --feature_type spp [--use_iterative] [--use_uncertainty] \
      [--pose_backend cv2|jax] [--config_path ...] [--weight_path ...]

Differences from the reference driver (TPU-native):
  * the matcher forward is one jit program at a fixed padding bucket
    (keypoints are padded + masked — numerically exact, see impx/ops/sinkhorn.py);
  * `--use_iterative` runs the whole match<->pose loop on device
    (impx/eval/iterative.py) instead of host OpenCV per iteration;
  * `--pose_backend jax` replaces host MAGSAC with on-device RANSAC.
"""
from __future__ import annotations

import argparse
import os.path as osp
import time

import numpy as np
import jax
import jax.numpy as jnp

from impx.models import MatcherConfig, DGNNS, AdaGMN
from impx.data.reader import StandardReader, pad_features, round_up
from impx.eval.evaluator import AucEval
from impx.geometry import pose as pose_metrics
from impx.geometry.pose import compute_pose_error_np

parser = argparse.ArgumentParser(description="IMP (TPU)")
parser.add_argument("--matching_method", type=str, default="IMP",
                    choices=["IMP", "IMP_geo", "EIMP", "EIMP_geo"])
parser.add_argument("--dataset", type=str, default="scannet")
parser.add_argument("--feature_type", type=str, default="spp")
parser.add_argument("--use_dual_softmax", action="store_true", default=False)
parser.add_argument("--use_iterative", action="store_true", default=False)
parser.add_argument("--use_uncertainty", action="store_true", default=False)
parser.add_argument("--pose_backend", type=str, default="cv2", choices=["cv2", "jax"])
parser.add_argument("--config_path", type=str, default=None)
parser.add_argument("--weight_path", type=str, default=None)
parser.add_argument("--weight_root", type=str, default="weights")
parser.add_argument("--max_pairs", type=int, default=-1)
parser.add_argument("--layers", type=int, default=15,
                    help="matcher iterations (15 = the published eval config; "
                         "smaller values are for CPU smoke runs only)")
parser.add_argument("--bucket", type=int, default=-1, help="keypoint padding bucket")
parser.add_argument("--attn_impl", type=str, default="xla", choices=["xla", "pallas"],
                    help="pallas = fused kernels via the scan fast path (fastest; "
                         "first kernel compile can take minutes on a cold cache)")
parser.add_argument("--compute_dtype", type=str, default="float32",
                    choices=["float32", "bfloat16"])
parser.add_argument("--eval_batch", type=int, default=4,
                    help="pairs per device call on the non-iterative path")
parser.add_argument("--ransac_hypotheses", type=int, default=4096,
                    help="hypothesis budget of the on-device checkpoint "
                         "RANSAC in the iterative loop (the reference's "
                         "checkpoints run adaptive cv2 USAC_MAGSAC; 4096 is "
                         "the accuracy-matched eval default per the cross-"
                         "framework study — bench configs pick their own "
                         "throughput-oriented budgets)")
parser.add_argument("--checkpoint_backend", type=str, default="jax",
                    choices=["jax", "cv2"],
                    help="pose solver at the iterative loop's checkpoints: "
                         "jax = on-device RANSAC (TPU-native); cv2 = host "
                         "USAC_MAGSAC exactly as the reference's loop "
                         "(eval/matching.py:84-87) — the divergence-isolation "
                         "mode for cross-framework studies (forces "
                         "eval_batch=1 iterative)")
parser.add_argument("--data_parallel", action="store_true", default=False,
                    help="shard each eval batch's pair axis over all local "
                         "devices (eval_batch should be a multiple of the "
                         "device count)")
parser.add_argument("--compaction", type=str, default="",
                    help="EIMP bucketed compaction schedule 'it:bucket[,it:bucket]' "
                         "(e.g. '4:1024'): physically gather survivors into "
                         "smaller buckets so attention/Sinkhorn cost shrinks "
                         "(pallas fast path only)")

# reference weight-name table (eval/eval_imp.py:274-329)
WEIGHT_TABLE = {
    "IMP_geo": {"spp": {"scannet": "imp_geo_spp_scannet.pth", "yfcc": "imp_geo_spp_yfcc.pth"},
                "sift": {"scannet": "imp_geo_sift.pth", "yfcc": "imp_geo_sift.pth"}},
    "IMP": {"spp": {"scannet": "imp_spp.pth", "yfcc": "imp_spp.pth"},
            "sift": {"scannet": "imp_sift.pth", "yfcc": "imp_sift.pth"}},
    "EIMP": {"spp": {"scannet": "eimp_spp.pth", "yfcc": "eimp_spp.pth"},
             "sift": {"scannet": "eimp_sift.pth", "yfcc": "eimp_sift.pth"}},
    "EIMP_geo": {"spp": {"scannet": "eimp_geo_spp_scannet.pth", "yfcc": "eimp_geo_spp_yfcc.pth"},
                 "sift": {"scannet": "eimp_geo_sift.pth", "yfcc": "eimp_geo_sift.pth"}},
}


def _normalize_keypoints_np(kpts, height, width, scale=0.7):
    size = np.array([width, height], np.float32)
    return (kpts - size / 2.0) / (size.max() * scale)


def _normalize_intrinsic_np(x, K):
    K = np.asarray(K)
    return (x - K[:2, 2]) / np.array([K[0, 0], K[1, 1]])


def parse_compaction(spec: str) -> tuple:
    """'4:1024,8:512' -> ((4, 1024), (8, 512))."""
    if not spec:
        return ()
    return tuple(tuple(int(v) for v in part.split(":")) for part in spec.split(","))


def build_model(matching_method: str, feature: str, use_sinkhorn: bool = True,
                n_layers: int = 15, attn_impl: str = "xla",
                compute_dtype: str = "float32", compaction: tuple = ()):
    import dataclasses

    cfg = MatcherConfig.eval_config(feature, n_layers=n_layers)
    cfg = dataclasses.replace(cfg, with_sinkhorn=use_sinkhorn,
                              attn_impl=attn_impl, compute_dtype=compute_dtype,
                              compaction=tuple(compaction))
    if matching_method.startswith("EIMP"):
        return AdaGMN(cfg)
    return DGNNS(cfg)


def load_params(model, weight_file: str | None):
    if weight_file and osp.isfile(weight_file):
        from impx.tools.convert_torch import load_matcher_checkpoint

        print(f"Loading converted torch weights from {weight_file}")
        return load_matcher_checkpoint(weight_file, model.config, model.sharing)
    print("WARNING: no weights found — using random init (synthetic/dev mode)")
    return model.init(jax.random.PRNGKey(0))


def _pair_feed_np(info, bucket):
    x0, d0, v0 = pad_features(info["x1"], info["desc1"], bucket)
    x1, d1, v1 = pad_features(info["x2"], info["desc2"], bucket)
    h0, w0 = info.get("img_size1", (480, 640))
    h1, w1 = info.get("img_size2", (480, 640))
    return {
        "descriptors0": d0, "descriptors1": d1,
        "norm_keypoints0": _normalize_keypoints_np(x0[:, :2], h0, w0),
        "norm_keypoints1": _normalize_keypoints_np(x1[:, :2], h1, w1),
        "scores0": x0[:, 2], "scores1": x1[:, 2],
        "valid0": v0, "valid1": v1,
    }, x0, x1


def _score_pair(info, x0, x1, matches, bucket, pose_errors, precisions,
                matching_scores, error_th, pred_R=None, pred_t=None, has_pose=False):
    from impx.geometry.epipolar import compute_epi_inlier_np
    from impx.ransac.pose_solver import estimate_pose

    K0, K1 = info["K1"], info["K2"]
    valid = matches > -1
    mkpts0 = x0[valid, :2]
    mkpts1 = x1[np.clip(matches[valid], 0, bucket - 1), :2]
    T_0to1 = np.hstack([info["r_gt"], info["t_gt"].reshape(3, 1)])

    norm_m0 = _normalize_intrinsic_np(mkpts0, K0)
    norm_m1 = _normalize_intrinsic_np(mkpts1, K1)
    if len(norm_m0) > 0:
        correct = compute_epi_inlier_np(norm_m0, norm_m1, info["e"], 0.005)
        precision = float(correct.mean())
        matching_score = float(correct.sum() / max(len(info["x1"]), 1))
    else:
        precision = matching_score = 0.0

    if has_pose:
        err_t, err_R = compute_pose_error_np(T_0to1, pred_R, pred_t)
    else:
        ret = estimate_pose(mkpts0, mkpts1, K0, K1, error_th) if len(mkpts0) >= 5 else None
        if ret is None:
            err_t = err_R = np.inf
        else:
            _, R_est, t_est, _ = ret
            err_t, err_R = compute_pose_error_np(T_0to1, R_est, t_est)
    pose_errors.append(max(err_R, err_t))
    precisions.append(precision)
    matching_scores.append(matching_score)


def evaluate(model, params, reader, error_th: float, eval_config: dict, args) -> dict:
    thresholds = [5, 10, 20, 50]
    pose_errors, precisions, matching_scores, stop_its = [], [], [], []
    n_pairs = len(reader) if args.max_pairs < 0 else min(args.max_pairs, len(reader))

    # choose the padding bucket from the dataset's max keypoint count
    bucket = args.bucket
    if bucket <= 0:
        bucket = round_up(reader.num_kpt, 128)

    produce = jax.jit(
        lambda p, d: model.produce_matches(p, d, p=0.2, only_last=True,
                                           with_scores=False))
    iterative_fn = None

    # data-parallel eval: shard the batch's pair axis over all local chips
    # (the eval analog of the reference's multi-GPU DDP training split;
    # eval_batch should be a multiple of the device count)
    shard = lambda b: b  # noqa: E731
    if getattr(args, "data_parallel", False) and len(jax.devices()) > 1:
        from impx.parallel.mesh import make_mesh, replicate, shard_batch

        n_dev = len(jax.devices())
        if args.eval_batch % n_dev != 0:
            raise SystemExit(
                f"--data_parallel requires --eval_batch divisible by the "
                f"local device count ({n_dev}); got "
                f"--eval_batch {args.eval_batch}")
        mesh = make_mesh()
        params = replicate(mesh, params)
        shard = lambda b: shard_batch(mesh, b)  # noqa: E731
        # both paths shard the pair axis: the non-iterative batched forward
        # and the batched iterative loop (every op in run_batch is
        # batch-parallel; the all-converged reduce becomes an XLA all-reduce)
        print(f"data-parallel eval over {len(jax.devices())} devices"
              + (" (iterative)" if args.use_iterative else ""))

    evaluator = AucEval({**eval_config, "pose_backend": args.pose_backend})
    key = jax.random.PRNGKey(0)
    t_start = time.time()
    t_device = 0.0

    ckpt_backend = getattr(args, "checkpoint_backend", "jax")
    if args.use_iterative and getattr(args, "eval_batch", 4) > 1 \
            and ckpt_backend == "jax":
        # batched iterative path: B pairs per program, per-pair convergence
        # freezing (impx/eval/iterative.py:BatchedIterativeMatcher)
        from impx.eval.iterative import BatchedIterativeMatcher
        from impx.ransac.pose_solver import _norm_threshold

        eb = getattr(args, "eval_batch", 4)
        matcher = None
        index = 0
        while index < n_pairs:
            infos, x0s, x1s, feeds, nts = [], [], [], [], []
            for _ in range(min(eb, n_pairs - index)):
                info = reader.run(index)
                feed, x0, x1 = _pair_feed_np(info, bucket)
                feed["x0n"] = _normalize_intrinsic_np(x0[:, :2], info["K1"])
                feed["x1n"] = _normalize_intrinsic_np(x1[:, :2], info["K2"])
                infos.append(info)
                x0s.append(x0)
                x1s.append(x1)
                feeds.append(feed)
                nts.append(_norm_threshold(error_th, info["K1"], info["K2"]))
                index += 1
            n_real = len(infos)
            while len(feeds) < eb:  # pad the last batch
                feeds.append(feeds[-1])
                nts.append(nts[-1])
            batch = shard({k: jnp.asarray(np.stack([f[k] for f in feeds]))
                           for k in feeds[0]})
            if matcher is None:
                matcher = BatchedIterativeMatcher(
                    model, params, norm_thresh=float(np.mean(nts)),
                    match_ratio=0.1, min_kpts=25,
                    num_hypotheses=getattr(args, "ransac_hypotheses", 4096),
                    with_uncertainty=args.use_uncertainty)
            t0 = time.time()
            key, sub = jax.random.split(key)
            out = matcher.run_batch(
                batch, sub, shard(jnp.asarray(nts, jnp.float32)))
            matches_b = np.asarray(out["indices0"])
            Rb, tb = np.asarray(out["R"]), np.asarray(out["t"])
            has_b = np.asarray(out["has_pose"])
            stops = np.asarray(out["stopped_at"])
            t_device += time.time() - t0
            for bi in range(n_real):
                _score_pair(infos[bi], x0s[bi], x1s[bi], matches_b[bi], bucket,
                            pose_errors, precisions, matching_scores, error_th,
                            pred_R=Rb[bi], pred_t=tb[bi],
                            has_pose=bool(has_b[bi]))
                stop_its.append(int(stops[bi]))
            if index % 100 < eb or index >= n_pairs:
                aucs = [100 * a for a in pose_metrics.pose_auc(pose_errors, thresholds)]
                print(f"[{index}/{n_pairs}] AUC@5/10/20/50: "
                      f"{aucs[0]:.2f}/{aucs[1]:.2f}/{aucs[2]:.2f}/{aucs[3]:.2f} "
                      f"Prec {100 * np.mean(precisions):.2f} "
                      f"MScore {100 * np.mean(matching_scores):.2f} "
                      f"stop {np.mean(stop_its):.1f} "
                      f"({t_device / max(index, 1) * 1000:.1f} ms/pair device)")
        aucs = [100 * a for a in pose_metrics.pose_auc(pose_errors, thresholds)]
        return {
            "auc": dict(zip(thresholds, aucs)),
            "precision": 100 * float(np.mean(precisions)),
            "matching_score": 100 * float(np.mean(matching_scores)),
            "mean_stop_iteration": float(np.mean(stop_its)),
            "pairs_per_sec_device": (len(pose_errors) / t_device) if t_device > 0 else 0.0,
            "total_time": time.time() - t_start,
        }

    if not args.use_iterative:
        # batched path: several pairs per device call
        eb = max(1, getattr(args, "eval_batch", 4))
        index = 0
        n_overflow_pairs = 0
        produce_fallback = None  # mask-only forward, built lazily on overflow
        while index < n_pairs:
            infos, x0s, x1s, feeds = [], [], [], []
            for _ in range(min(eb, n_pairs - index)):
                info = reader.run(index)
                feed, x0, x1 = _pair_feed_np(info, bucket)
                infos.append(info)
                x0s.append(x0)
                x1s.append(x1)
                feeds.append(feed)
                index += 1
            while len(feeds) < eb:  # pad the last batch
                feeds.append(feeds[-1])
            batch = shard({k: jnp.asarray(np.stack([f[k] for f in feeds]))
                           for k in feeds[0]})
            t0 = time.time()
            out = produce(params, batch)
            # np.array (copy): np.asarray of a jax array is a READ-ONLY view
            # and the overflow fallback below assigns into rows
            matches_b = np.array(out["indices0"][-1])
            # compaction overflow recovery: the bucketed path reports how
            # many survivors each compaction point dropped; any affected
            # pair is re-run through the mask-only path (which keeps every
            # survivor, like the reference adgm.py:463-506) so a too-tight
            # schedule can never silently lose matches
            if "overflow0" in out:
                ovf = np.asarray(out["overflow0"]) + np.asarray(out["overflow1"])
                bad = np.flatnonzero(ovf[:len(infos)] > 0)
                if len(bad):
                    n_overflow_pairs += len(bad)
                    print(f"WARNING: compaction overflow on pairs "
                          f"{(index - len(infos) + bad).tolist()} "
                          f"(dropped {ovf[bad].tolist()} survivors) — "
                          f"re-running mask-only")
                    if produce_fallback is None:
                        import dataclasses as _dc

                        fb_model = type(model)(
                            _dc.replace(model.config, compaction=()))
                        produce_fallback = jax.jit(
                            lambda p, d: fb_model.produce_matches(
                                p, d, p=0.2, only_last=True, with_scores=False))
                    out_fb = produce_fallback(params, batch)
                    matches_b[bad] = np.asarray(out_fb["indices0"][-1])[bad]
            t_device += time.time() - t0
            for bi, info in enumerate(infos):
                _score_pair(info, x0s[bi], x1s[bi], matches_b[bi], bucket,
                            pose_errors, precisions, matching_scores, error_th)
                stop_its.append(model.config.n_layers)
            if index % 100 < eb or index >= n_pairs:
                aucs = [100 * a for a in pose_metrics.pose_auc(pose_errors, thresholds)]
                print(f"[{index}/{n_pairs}] AUC@5/10/20/50: "
                      f"{aucs[0]:.2f}/{aucs[1]:.2f}/{aucs[2]:.2f}/{aucs[3]:.2f} "
                      f"Prec {100 * np.mean(precisions):.2f} "
                      f"MScore {100 * np.mean(matching_scores):.2f} "
                      f"({t_device / max(index, 1) * 1000:.1f} ms/pair device)")
        aucs = [100 * a for a in pose_metrics.pose_auc(pose_errors, thresholds)]
        results = {
            "auc": dict(zip(thresholds, aucs)),
            "precision": 100 * float(np.mean(precisions)),
            "matching_score": 100 * float(np.mean(matching_scores)),
            "mean_stop_iteration": float(np.mean(stop_its)),
            "pairs_per_sec_device": (len(pose_errors) / t_device) if t_device > 0 else 0.0,
            "total_time": time.time() - t_start,
        }
        if model.config.compaction:
            results["compaction_overflow_pairs"] = n_overflow_pairs
        return results

    for index in range(n_pairs):
        info = reader.run(index)
        x0, d0, v0 = pad_features(info["x1"], info["desc1"], bucket)
        x1, d1, v1 = pad_features(info["x2"], info["desc2"], bucket)
        K0, K1 = info["K1"], info["K2"]
        h0, w0 = info.get("img_size1", (480, 640))
        h1, w1 = info.get("img_size2", (480, 640))

        norm_k0 = _normalize_keypoints_np(x0[:, :2], h0, w0)
        norm_k1 = _normalize_keypoints_np(x1[:, :2], h1, w1)
        feed = {
            "descriptors0": jnp.asarray(d0)[None],
            "descriptors1": jnp.asarray(d1)[None],
            "norm_keypoints0": jnp.asarray(norm_k0)[None],
            "norm_keypoints1": jnp.asarray(norm_k1)[None],
            "scores0": jnp.asarray(x0[:, 2])[None],
            "scores1": jnp.asarray(x1[:, 2])[None],
            "valid0": jnp.asarray(v0)[None],
            "valid1": jnp.asarray(v1)[None],
        }

        t0 = time.time()
        if args.use_iterative:
            from impx.eval.iterative import IterativeMatcher
            from impx.ransac.pose_solver import _norm_threshold

            x0n = _normalize_intrinsic_np(x0[:, :2], K0)
            x1n = _normalize_intrinsic_np(x1[:, :2], K1)
            feed["x0n"] = jnp.asarray(x0n)
            feed["x1n"] = jnp.asarray(x1n)
            if ckpt_backend == "cv2":
                # cv2 checkpoints take PIXEL coords + real intrinsics (the
                # reference protocol; cv2's USAC internals are not
                # scale-invariant — see IterativeMatcher._run_cv2)
                # raw reader dtype (float32), like the reference's pts0_cpu
                feed["x0px"] = np.ascontiguousarray(x0[:, :2])
                feed["x1px"] = np.ascontiguousarray(x1[:, :2])
                feed["K0"] = np.asarray(K0, np.float64)
                feed["K1"] = np.asarray(K1, np.float64)
                feed["error_th_px"] = float(error_th)
            nt = _norm_threshold(error_th, K0, K1)
            if iterative_fn is None:
                iterative_fn = IterativeMatcher(
                    model, params, norm_thresh=nt, match_ratio=0.1,
                    min_kpts=25,
                    num_hypotheses=getattr(args, "ransac_hypotheses", 4096),
                    with_uncertainty=args.use_uncertainty,
                    checkpoint_backend=ckpt_backend)
            key, sub = jax.random.split(key)
            out = iterative_fn.run(feed, sub, norm_thresh=nt)
            matches = np.asarray(out["indices0"])
            pred_R, pred_t = np.asarray(out["R"]), np.asarray(out["t"])
            has_pose = bool(out["has_pose"])
            stop_its.append(int(out["stopped_at"]))
        else:
            out = produce(params, feed)
            matches = np.asarray(out["indices0"][-1][0])
            pred_R = pred_t = None
            has_pose = False
            stop_its.append(model.config.n_layers)
        t_device += time.time() - t0

        _score_pair(info, x0, x1, matches, bucket, pose_errors, precisions,
                    matching_scores, error_th, pred_R=pred_R, pred_t=pred_t,
                    has_pose=has_pose)

        if (index + 1) % 100 == 0 or index + 1 == n_pairs:
            aucs = [100 * a for a in pose_metrics.pose_auc(pose_errors, thresholds)]
            print(f"[{index + 1}/{n_pairs}] AUC@5/10/20/50: "
                  f"{aucs[0]:.2f}/{aucs[1]:.2f}/{aucs[2]:.2f}/{aucs[3]:.2f} "
                  f"Prec {100 * np.mean(precisions):.2f} "
                  f"MScore {100 * np.mean(matching_scores):.2f} "
                  f"({t_device / (index + 1) * 1000:.1f} ms/pair device)")

    aucs = [100 * a for a in pose_metrics.pose_auc(pose_errors, thresholds)]
    return {
        "auc": dict(zip(thresholds, aucs)),
        "precision": 100 * float(np.mean(precisions)),
        "matching_score": 100 * float(np.mean(matching_scores)),
        "mean_stop_iteration": float(np.mean(stop_its)),
        "pairs_per_sec_device": (len(pose_errors) / t_device) if t_device > 0 else 0.0,
        "total_time": time.time() - t_start,
    }


def main(argv=None):
    from impx.tools.compile_cache import enable as enable_compile_cache

    enable_compile_cache()  # cold-start: 15-layer compiles reload in seconds
    args = parser.parse_args(argv)
    feat = args.feature_type
    error_th = 3 if args.dataset == "scannet" else 1

    if args.config_path:
        import yaml

        with open(args.config_path) as f:
            config = yaml.safe_load(f)
        read_config = config["reader"]
        eval_config = config["evaluator"]
    else:
        default = f"configs/{args.dataset}_eval_gm{'' if feat == 'spp' else '_sift'}.yaml"
        if osp.isfile(default):
            import yaml

            with open(default) as f:
                config = yaml.safe_load(f)
            read_config = config["reader"]
            eval_config = config["evaluator"]
        else:
            raise SystemExit(f"no config found at {default}; pass --config_path")

    model = build_model(args.matching_method, feat,
                        use_sinkhorn=not args.use_dual_softmax,
                        n_layers=args.layers,
                        attn_impl=args.attn_impl, compute_dtype=args.compute_dtype,
                        compaction=parse_compaction(args.compaction))
    weight_file = args.weight_path or osp.join(
        args.weight_root, WEIGHT_TABLE[args.matching_method][feat][args.dataset])
    params = load_params(model, weight_file)

    reader = StandardReader(read_config)
    results = evaluate(model, params, reader, error_th, eval_config, args)
    print(f"Results of {args.matching_method} on {args.dataset} "
          f"(iterative={args.use_iterative}, uncertainty={args.use_uncertainty}, "
          f"pose={args.pose_backend}):")
    for k, v in results.items():
        print(f"  {k}: {v}")
    return results


if __name__ == "__main__":
    main()
