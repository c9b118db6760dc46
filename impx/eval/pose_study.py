"""Synthetic relative-pose accuracy study: jax RANSAC (5pt / 8pt) vs OpenCV
USAC_MAGSAC.

The reference's headline pose AUC rides on cv2.findEssentialMat(USAC_MAGSAC)
(reference eval/pose_estimation.py:96-105). This study validates the
on-device backend (impx/ransac/) against it on a controlled protocol —
random poses, 3D points projected into two cameras, Gaussian pixel noise,
uniform outliers — across noise/outlier grids with matched hypothesis
budgets, reporting pose AUC@5/10/20 like the YFCC protocol.

CLI: python -m impx.eval.pose_study [--trials 100] [--n 500] [--fast]
"""
from __future__ import annotations

import argparse

import numpy as np

FOCAL = 500.0
SIZE = 1000.0


def synth_pair(rs: np.random.RandomState, n: int, noise_px: float,
               outlier_ratio: float):
    """Random pose + 3D scene -> pixel matches with noise and outliers.
    Returns (kpts0, kpts1 [N,2] px, K, R_gt, t_gt)."""
    aa = rs.randn(3) * 0.4
    th = np.linalg.norm(aa)
    k = aa / max(th, 1e-9)
    K_ = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
    R = np.eye(3) + np.sin(th) * K_ + (1 - np.cos(th)) * K_ @ K_
    t = rs.randn(3)
    t /= np.linalg.norm(t)

    P = rs.randn(n, 3) * np.array([2.0, 2.0, 1.0]) + np.array([0, 0, 6.0])
    x0 = P[:, :2] / P[:, 2:]
    Pc = P @ R.T + t
    x1 = Pc[:, :2] / Pc[:, 2:]

    K = np.array([[FOCAL, 0, SIZE / 2], [0, FOCAL, SIZE / 2], [0, 0, 1.0]])
    k0 = x0 * FOCAL + SIZE / 2
    k1 = x1 * FOCAL + SIZE / 2
    k0 += rs.randn(n, 2) * noise_px
    k1 += rs.randn(n, 2) * noise_px

    n_out = int(n * outlier_ratio)
    if n_out:
        idx = rs.choice(n, n_out, replace=False)
        k1[idx] = rs.rand(n_out, 2) * SIZE  # random wrong partners
    return k0.astype(np.float32), k1.astype(np.float32), K, R, t


def pose_err(R_gt, t_gt, R, t):
    """max(rotation, translation) angular error in degrees (reference
    tools/utils.py:425-443)."""
    if R is None:
        return np.inf
    cos = (np.trace(R_gt.T @ R) - 1) / 2
    e_r = np.rad2deg(np.arccos(np.clip(cos, -1, 1)))
    c = np.dot(t_gt, t) / (np.linalg.norm(t_gt) * np.linalg.norm(t) + 1e-15)
    e_t = np.rad2deg(np.arccos(np.clip(abs(c), -1, 1)))
    return max(e_r, e_t)


def run_backend(backend, pairs, threshold_px=1.0, num_hypotheses=1024):
    """backend: 'cv2' | 'jax8' | 'jax5'. Returns list of pose errors."""
    errors = []
    if backend == "cv2":
        from impx.ransac.pose_solver import estimate_pose_cv2, _norm_threshold

        for k0, k1, K, R_gt, t_gt in pairs:
            nt = _norm_threshold(threshold_px, K, K)
            ret = estimate_pose_cv2(k0, k1, K, K, nt)
            errors.append(pose_err(R_gt, t_gt, None if ret is None else ret[1],
                                   None if ret is None else ret[2]))
        return errors

    import jax
    import jax.numpy as jnp
    from impx.ransac.pose_solver import (estimate_pose_jax, normalize_pts,
                                         _norm_threshold)

    sample_size = 5 if backend == "jax5" else 8
    key = jax.random.PRNGKey(0)
    for k0, k1, K, R_gt, t_gt in pairs:
        x0n = jnp.asarray(normalize_pts(k0, K), jnp.float32)
        x1n = jnp.asarray(normalize_pts(k1, K), jnp.float32)
        valid = jnp.ones(len(k0), bool)
        key, sub = jax.random.split(key)
        out = estimate_pose_jax(sub, x0n, x1n, valid,
                                _norm_threshold(threshold_px, K, K),
                                num_hypotheses=num_hypotheses,
                                sample_size=sample_size)
        errors.append(pose_err(R_gt, t_gt, np.asarray(out["R"]),
                               np.asarray(out["t"])))
    return errors


def pose_auc(errors, thresholds=(5, 10, 20)):
    from impx.geometry.pose import pose_auc as _auc

    return [100 * a for a in _auc(errors, list(thresholds))]


def study(trials=50, n=500, noises=(0.5, 1.0, 2.0), outliers=(0.2, 0.5),
          backends=("cv2", "jax8", "jax5"), num_hypotheses=1024, seed=0):
    """Returns {(noise, outlier, backend): auc@[5,10,20]}."""
    results = {}
    for noise in noises:
        for outl in outliers:
            rs = np.random.RandomState(seed)
            pairs = [synth_pair(rs, n, noise, outl) for _ in range(trials)]
            for backend in backends:
                errs = run_backend(backend, pairs,
                                   num_hypotheses=num_hypotheses)
                results[(noise, outl, backend)] = pose_auc(errs)
    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trials", type=int, default=100)
    ap.add_argument("--n", type=int, default=500)
    ap.add_argument("--hypotheses", type=int, default=1024)
    ap.add_argument("--fast", action="store_true")
    args = ap.parse_args()
    trials = 20 if args.fast else args.trials

    res = study(trials=trials, n=args.n, num_hypotheses=args.hypotheses)
    print(f"\nPose AUC@5/10/20 over {trials} synthetic pairs "
          f"(N={args.n}, {args.hypotheses} hypotheses):")
    print(f"{'noise_px':>9} {'outliers':>9} {'backend':>7}  AUC@5   AUC@10  AUC@20")
    for (noise, outl, backend), aucs in sorted(res.items()):
        print(f"{noise:>9} {outl:>9} {backend:>7}  "
              f"{aucs[0]:6.2f}  {aucs[1]:6.2f}  {aucs[2]:6.2f}")


if __name__ == "__main__":
    main()
