"""Isolate the systematic non-iterative AUC delta at bit-identical matches.

Round-3 cross-study fact: forward match sets are bit-identical (48/48 pairs),
precision identical, yet ref AUC@5 differs from impx by ~1-2 points. Round-4
`--ref-repeats 3` measured ZERO cv2 MAGSAC run-to-run spread (deterministic
in this build), refuting the round-3 "jitter" explanation — the delta is
systematic. This probe decomposes the per-pair pose path into its three
stages and reports which one diverges:

  stage A: cv2.findEssentialMat — reference feeds float32 (torch .numpy()),
           impx feeds float64 (impx/ransac/pose_solver.py:267-268)
  stage B: cheirality decomposition — reference eval/pose_estimation.py:13-90
           (cv2 triangulatePoints x4) vs impx jnp decompose_essential_mat
  stage C: pose-error formula — reference tools/utils.py:436-442 vs the impx
           twin compute_pose_error_np (impx/geometry/pose.py:124-135)

Usage (CPU, ~3 min):
    python -m impx.eval.pose_delta_probe --pairs 48 --train-steps 200 \
        --weight-dir weights/cache/cross
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

from impx.tools.compile_cache import enable as _enable_cache


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=48)
    ap.add_argument("--num-kpt", type=int, default=512)
    ap.add_argument("--train-steps", type=int, default=200)
    ap.add_argument("--weight-dir", type=str, default="weights/cache/cross")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    _enable_cache()

    import cv2

    from impx.eval.cross_study import _build_models
    from impx.data.synthetic import write_eval_hdf5
    from impx.eval import eval_imp as ie
    from impx.ransac.pose_solver import estimate_pose_cv2
    from impx.geometry.pose import compute_pose_error_np

    sys.path.insert(0, "/root/reference")
    from eval.pose_estimation import estimate_pose as ref_estimate_pose
    from tools.utils import compute_pose_error as ref_compute_pose_error
    from tools.utils import pose_auc as ref_pose_auc

    tmp = "/tmp/pose_delta_probe"
    os.makedirs(tmp, exist_ok=True)
    h5 = write_eval_hdf5(os.path.join(tmp, "synth.hdf5"),
                         num_pairs=args.pairs, seed=args.seed,
                         image_dir=os.path.join(tmp, "images"),
                         n_inliers=args.num_kpt // 2,
                         n_outliers0=args.num_kpt // 2,
                         n_outliers1=args.num_kpt // 2, desc_dim=256)
    _, model, params = _build_models("IMP", args.seed, args.weight_dir,
                                     train_steps=args.train_steps,
                                     feature="spp")

    reader = ie.StandardReader({"rawdata_dir": None, "dataset_dir": h5,
                                "num_kpt": args.num_kpt})

    # capture per-pair matched pixel coords + GT through the impx loop,
    # exactly as _score_pair extracts them (eval_imp.py:150-154)
    pairs = []
    old_sp = ie._score_pair

    def wrapped_sp(info, x0, x1, matches, bucket, *a, **kw):
        m = np.asarray(matches)
        valid = m > -1
        pairs.append({
            "mk0": np.asarray(x0)[valid, :2].copy(),
            "mk1": np.asarray(x1)[np.clip(m[valid], 0, bucket - 1), :2].copy(),
            "K0": np.asarray(info["K1"], np.float64).copy(),
            "K1": np.asarray(info["K2"], np.float64).copy(),
            "r_gt": np.asarray(info["r_gt"]).copy(),
            "t_gt": np.asarray(info["t_gt"]).copy(),
        })
        return old_sp(info, x0, x1, matches, bucket, *a, **kw)

    ns = argparse.Namespace(use_iterative=False, use_uncertainty=False,
                            pose_backend="cv2", eval_batch=4,
                            bucket=args.num_kpt, max_pairs=args.pairs,
                            data_parallel=False, checkpoint_backend="jax")
    ie._score_pair = wrapped_sp
    try:
        ie.evaluate(model, params, reader, 1.0,
                    {"rescale": 1600, "inlier_th": 0.005}, ns)
    finally:
        ie._score_pair = old_sp

    print(f"[probe] captured {len(pairs)} pairs", flush=True)

    # Per-pair, per-stage comparison.
    rows = []
    for i, p in enumerate(pairs):
        mk0_32 = p["mk0"].astype(np.float32)
        mk1_32 = p["mk1"].astype(np.float32)
        K0, K1 = p["K0"], p["K1"]
        T = np.eye(4)
        T[:3, :3] = p["r_gt"]
        T[:3, 3] = p["t_gt"]

        # reference path exactly: float32 pixels -> estimate_pose ->
        # compute_pose_error
        ret_ref = ref_estimate_pose(mk0_32.copy(), mk1_32.copy(), K0, K1,
                                    1.0, method=cv2.USAC_MAGSAC)
        if ret_ref is None:
            err_ref = np.inf
            E_ref = None
        else:
            E_ref, R_ref, t_ref, _ = ret_ref
            et, er = ref_compute_pose_error(T, R_ref, t_ref)
            err_ref = max(er, et)

        # impx path exactly: float64 cast -> estimate_pose_cv2 ->
        # compute_pose_error_np (eval_imp.py:168-173)
        T34 = np.hstack([p["r_gt"], p["t_gt"].reshape(3, 1)])
        ret_imp = estimate_pose_cv2(p["mk0"], p["mk1"], K0, K1, 1.0)
        if ret_imp is None:
            err_imp = np.inf
            E_imp = None
        else:
            E_imp, R_imp, t_imp, _ = ret_imp
            et, er = compute_pose_error_np(T34, R_imp, t_imp)
            err_imp = max(er, et)

        # stage A: same solver (reference's), float64 input instead
        ret_64 = ref_estimate_pose(p["mk0"].astype(np.float64),
                                   p["mk1"].astype(np.float64), K0, K1,
                                   1.0, method=cv2.USAC_MAGSAC)
        e_same_dtype = (ret_ref is not None and ret_64 is not None and
                        np.array_equal(ret_ref[0], ret_64[0]))
        # stage A2: per-call determinism — same solver, same inputs, again
        ret_rep = ref_estimate_pose(mk0_32.copy(), mk1_32.copy(), K0, K1,
                                    1.0, method=cv2.USAC_MAGSAC)
        e_repeat = (ret_ref is not None and ret_rep is not None and
                    np.array_equal(ret_ref[0], ret_rep[0]))
        # stage A3: the two frameworks' actual cv2 wrappers, E bitwise
        e_cross = (ret_ref is not None and ret_imp is not None and
                   np.array_equal(np.asarray(ret_ref[0]),
                                  np.asarray(ret_imp[0])))

        # stage B: impx decomposition fed the REFERENCE's E + inlier mask
        errB = None
        if ret_ref is not None:
            from impx.geometry.triangulation import decompose_essential_mat
            import jax.numpy as jnp

            Kavg = (K0 + K1) / 2.0
            sel_mask = ret_ref[3]
            x0n = (mk0_32[sel_mask] - Kavg[:2, 2]) / np.array(
                [Kavg[0, 0], Kavg[1, 1]])
            x1n = (mk1_32[sel_mask] - Kavg[:2, 2]) / np.array(
                [Kavg[0, 0], Kavg[1, 1]])
            R_b, t_b, _, _ = decompose_essential_mat(
                jnp.asarray(E_ref), jnp.asarray(x0n), jnp.asarray(x1n))
            same_Rt = (np.allclose(np.asarray(R_b), ret_ref[1], atol=1e-5) and
                       np.allclose(np.asarray(t_b).ravel(),
                                   np.asarray(ret_ref[2]).ravel(), atol=1e-5))
            errB = same_Rt

        # stage C: both error formulas on the REFERENCE's (R, t)
        errC = None
        if ret_ref is not None:
            et1, er1 = ref_compute_pose_error(T, ret_ref[1], ret_ref[2])
            et2, er2 = compute_pose_error_np(T34, ret_ref[1], ret_ref[2])
            errC = (abs(max(er1, et1) - max(er2, et2)))

        rows.append({"pair": i, "err_ref": err_ref, "err_imp": err_imp,
                     "E_equal_dtype": e_same_dtype, "E_repeat": e_repeat,
                     "E_cross": e_cross, "decomp_equal": errB,
                     "errfn_absdiff": errC})

    d = np.array([abs(r["err_ref"] - r["err_imp"]) for r in rows])
    n_diff = int((d > 0.1).sum())
    print(f"\n[probe] pairs with |err_ref - err_imp| > 0.1 deg: "
          f"{n_diff}/{len(rows)}")
    print(f"[probe] stage A (E bitwise equal f32 vs f64 input): "
          f"{sum(bool(r['E_equal_dtype']) for r in rows)}/{len(rows)}")
    print(f"[probe] stage A2 (E bitwise equal, repeated identical call): "
          f"{sum(bool(r['E_repeat']) for r in rows)}/{len(rows)}")
    print(f"[probe] stage A3 (E bitwise equal, ref wrapper vs impx wrapper): "
          f"{sum(bool(r['E_cross']) for r in rows)}/{len(rows)}")
    print(f"[probe] stage B (impx decomp == ref decomp on same E): "
          f"{sum(bool(r['decomp_equal']) for r in rows)}/{len(rows)}")
    cmax = max(r["errfn_absdiff"] for r in rows if r["errfn_absdiff"]
               is not None)
    print(f"[probe] stage C (error-formula max abs diff on same R,t): "
          f"{cmax:.2e} deg")
    for r in rows:
        if abs(r["err_ref"] - r["err_imp"]) > 0.1:
            print(f"  pair {r['pair']:2d}: ref {r['err_ref']:8.3f}  "
                  f"impx {r['err_imp']:8.3f}  E_eq={r['E_equal_dtype']} "
                  f"E_rep={r['E_repeat']} E_cross={r['E_cross']} "
                  f"decomp_eq={r['decomp_equal']} "
                  f"errfn_d={r['errfn_absdiff']:.1e}")

    ths = [5.0, 10.0, 20.0]
    auc_ref = [100 * v for v in ref_pose_auc(
        [r["err_ref"] for r in rows], ths)]
    auc_imp = [100 * v for v in ref_pose_auc(
        [r["err_imp"] for r in rows], ths)]
    print(f"[probe] AUC@5/10/20 ref-path  {auc_ref}")
    print(f"[probe] AUC@5/10/20 impx-path {auc_imp}")


if __name__ == "__main__":
    main()
