"""Two-image matching demo.

  python -m impx.demo --image0 a.jpg --image1 b.jpg --feature sift \
      [--weights runs/.../ckpt | weights/imp_sift.pth] [--output matches.png] \
      [--use_iterative --fx 1200]

Extract features (SIFT needs no weights; SuperPoint needs superpoint_v1.pth),
run the matcher, optionally estimate the relative pose, and write a match
visualization. Mirrors the live-demo utility surface of the reference
(tools/utils.py VideoStreamer + plotting).
"""
from __future__ import annotations

import argparse

import numpy as np

parser = argparse.ArgumentParser()
parser.add_argument("--image0", type=str, required=True)
parser.add_argument("--image1", type=str, required=True)
parser.add_argument("--feature", type=str, default="sift", choices=["sift", "spp"])
parser.add_argument("--num_kpt", type=int, default=1024)
parser.add_argument("--weights", type=str, default=None,
                    help=".pth (torch, converted on load) or orbax checkpoint dir")
parser.add_argument("--matching_method", type=str, default="IMP",
                    choices=["IMP", "EIMP"])
parser.add_argument("--match_threshold", type=float, default=0.2)
parser.add_argument("--output", type=str, default="matches.png")
parser.add_argument("--fx", type=float, default=0.0,
                    help="focal length in px; >0 enables pose estimation "
                         "(principal point assumed at the image center)")
parser.add_argument("--sp_weights", type=str, default="weights/superpoint_v1.pth")


def load_image_features(args, path):
    import cv2

    if args.feature == "sift":
        from impx.data.extractors import ExtractSIFT

        ex = ExtractSIFT({"num_kpt": args.num_kpt, "det_th": 1e-5, "resize": [-1]})
    else:
        from impx.data.extractors import ExtractSuperpoint

        ex = ExtractSuperpoint({"num_kpt": args.num_kpt, "det_th": 0.005,
                                "resize": [-1], "weight_path": args.sp_weights})
    img = cv2.imread(path, cv2.IMREAD_GRAYSCALE)
    if img is None:
        raise SystemExit(f"cannot read {path}")
    kpt, desc = ex.run(img)
    return img, kpt, desc


def main(argv=None):
    import jax
    import jax.numpy as jnp

    from impx.data.reader import pad_features, round_up
    from impx.eval.eval_imp import build_model, load_params
    from impx.geometry.keypoints import normalize_keypoints
    from impx.tools.viz import draw_matches, matches_from_indices0

    args = parser.parse_args(argv)
    img0, kpt0, desc0 = load_image_features(args, args.image0)
    img1, kpt1, desc1 = load_image_features(args, args.image1)
    print(f"features: {len(kpt0)} / {len(kpt1)}")

    model = build_model(args.matching_method, args.feature)
    params = load_params(model, args.weights)

    bucket = round_up(max(len(kpt0), len(kpt1), 128), 128)
    x0, d0, v0 = pad_features(kpt0, desc0, bucket)
    x1, d1, v1 = pad_features(kpt1, desc1, bucket)
    feed = {
        "descriptors0": jnp.asarray(d0)[None],
        "descriptors1": jnp.asarray(d1)[None],
        "norm_keypoints0": jnp.asarray(np.asarray(normalize_keypoints(
            jnp.asarray(x0[:, :2]), img0.shape[0], img0.shape[1])))[None],
        "norm_keypoints1": jnp.asarray(np.asarray(normalize_keypoints(
            jnp.asarray(x1[:, :2]), img1.shape[0], img1.shape[1])))[None],
        "scores0": jnp.asarray(x0[:, 2])[None],
        "scores1": jnp.asarray(x1[:, 2])[None],
        "valid0": jnp.asarray(v0)[None],
        "valid1": jnp.asarray(v1)[None],
    }
    out = model.produce_matches(params, feed, p=args.match_threshold, only_last=True)
    indices0 = np.asarray(out["indices0"][-1][0])
    matches = matches_from_indices0(indices0)
    print(f"matches: {len(matches)}")

    inliers = None
    if args.fx > 0 and len(matches) >= 5:
        from impx.ransac.pose_solver import estimate_pose

        K0 = np.array([[args.fx, 0, img0.shape[1] / 2],
                       [0, args.fx, img0.shape[0] / 2], [0, 0, 1]])
        K1 = np.array([[args.fx, 0, img1.shape[1] / 2],
                       [0, args.fx, img1.shape[0] / 2], [0, 0, 1]])
        ret = estimate_pose(x0[matches[:, 0], :2], x1[matches[:, 1], :2],
                            K0, K1, norm_thresh=1.0)
        if ret is not None:
            _, R, t, mask = ret
            inliers = mask[: len(matches)]
            print(f"pose inliers: {int(np.sum(inliers))}; R=\n{R}\nt={t}")

    canvas = draw_matches(img0, img1, x0[:, :2], x1[:, :2], matches, inliers)
    import cv2

    cv2.imwrite(args.output, canvas)
    print(f"wrote {args.output}")


if __name__ == "__main__":
    main()
