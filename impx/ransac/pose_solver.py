"""Relative-pose estimation from matched keypoints.

Two backends with one interface mirroring reference eval/pose_estimation.py:92-115
(`estimate_pose`: findEssentialMat + cheirality-checked decomposition):

  * `estimate_pose_jax`  — fully on-device (batched RANSAC + SVD decomposition
    + DLT cheirality). Fixed shapes; usable inside jit / the iterative loop.
  * `estimate_pose_cv2`  — host OpenCV USAC_MAGSAC, protocol-exact with the
    published eval numbers (same calls as the reference).

Thresholds: the reference passes a pixel threshold and camera matrices to
OpenCV, which normalizes internally by the mean focal length; we do the same
conversion explicitly.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from impx.geometry.epipolar import skew_symmetric
from impx.geometry.triangulation import decompose_essential_mat
from impx.ransac.ransac import estimate_essential_ransac


def _norm_threshold(threshold_px: float, K0, K1) -> float:
    """Pixel -> normalized threshold via mean focal (OpenCV convention)."""
    f = (K0[0][0] + K0[1][1] + K1[0][0] + K1[1][1]) / 4.0
    return threshold_px / f


def _expm_so3(w):
    """Rodrigues: so(3) vector -> rotation matrix (series-safe at 0)."""
    th2 = jnp.sum(w * w)
    th = jnp.sqrt(th2 + 1e-24)
    K = skew_symmetric(w)
    a = jnp.sinc(th / jnp.pi)                      # sin(th)/th
    b = 0.5 * jnp.sinc(th / (2 * jnp.pi)) ** 2     # (1-cos th)/th^2
    return jnp.eye(3) + a * K + b * (K @ K)


def _tangent_basis(t):
    """[3,2] orthonormal basis of the plane orthogonal to unit t."""
    # pick the axis least aligned with t to seed Gram-Schmidt
    a = jnp.where(jnp.abs(t[0]) < 0.9,
                  jnp.array([1.0, 0.0, 0.0]), jnp.array([0.0, 1.0, 0.0]))
    b1 = jnp.cross(t, a)
    b1 = b1 / (jnp.linalg.norm(b1) + 1e-18)
    b2 = jnp.cross(t, b1)
    return jnp.stack([b1, b2], axis=-1)


def _sampson_residual(E, x0, x1):
    """Signed first-order (Sampson) epipolar residual, [N]."""
    x0h = jnp.concatenate([x0, jnp.ones_like(x0[:, :1])], axis=-1)
    x1h = jnp.concatenate([x1, jnp.ones_like(x1[:, :1])], axis=-1)
    Ex0 = x0h @ E.T
    Etx1 = x1h @ E
    num = jnp.sum(x1h * Ex0, axis=-1)
    den = jnp.sqrt(Ex0[:, 0] ** 2 + Ex0[:, 1] ** 2
                   + Etx1[:, 0] ** 2 + Etx1[:, 1] ** 2 + 1e-18)
    return num / den


def refine_pose_gn(R, t, x0, x1, w, iters: int = 8, damping: float = 1e-8):
    """Gauss-Newton polish on the 5-DOF essential manifold: minimize the
    weighted Sampson error over (so(3) perturbation of R, tangent of the
    translation direction). The algebraic DLT refit inside RANSAC's IRLS is
    bias-prone at noise ~ threshold; this is the geometric final polish that
    cv2's USAC framework applies to its winner (its LM step), vectorized —
    jacfwd over 5 parameters is ~6 Sampson passes per iteration.

    w: [N] nonnegative weights (0 = excluded). Returns (R, t) with each GN
    step accepted only if the weighted cost decreased."""
    sw = jnp.sqrt(jnp.maximum(w, 0.0))

    def cost_of(R, t):
        r = _sampson_residual(skew_symmetric(t) @ R, x0, x1) * sw
        return jnp.sum(r * r), r

    def body(_, carry):
        R, t, c = carry
        B = _tangent_basis(t)

        def res(p):
            Rn = _expm_so3(p[:3]) @ R
            tn = t + B @ p[3:5]
            tn = tn / (jnp.linalg.norm(tn) + 1e-18)
            return _sampson_residual(skew_symmetric(tn) @ Rn, x0, x1) * sw

        p0 = jnp.zeros((5,))
        r = res(p0)
        J = jax.jacfwd(res)(p0)                      # [N, 5]
        H = J.T @ J + damping * jnp.eye(5)
        delta = -jnp.linalg.solve(H, J.T @ r)
        Rn = _expm_so3(delta[:3]) @ R
        tn = t + B @ delta[3:5]
        tn = tn / (jnp.linalg.norm(tn) + 1e-18)
        cn, _ = cost_of(Rn, tn)
        better = cn < c
        return (jnp.where(better, Rn, R), jnp.where(better, tn, t),
                jnp.where(better, cn, c))

    c0, _ = cost_of(R, t)
    R, t, _ = jax.lax.fori_loop(0, iters, body, (R, t, c0))
    return R, t


def normalize_pts(pts, K):
    K = np.asarray(K)
    return (np.asarray(pts) - K[:2, 2]) / np.array([K[0, 0], K[1, 1]])


def prior_essential(R, t, has_pose):
    """Safe warm-start model for `E_init`: the essential matrix of (R, t)
    when `has_pose`, else a fixed valid essential (pure z-translation) that
    simply competes and loses. Keeps E_init finite/nonzero under jit so the
    iterative loops can pass it unconditionally."""
    E_prev = skew_symmetric(t) @ R
    E_z = skew_symmetric(jnp.asarray([0.0, 0.0, 1.0]))
    return jnp.where(has_pose, E_prev, E_z)


@functools.partial(jax.jit, static_argnames=("num_hypotheses", "lo_iterations",
                                             "sample_size", "refine_iters"))
def estimate_pose_jax(
    key,
    x0n,
    x1n,
    valid,
    norm_thresh,
    num_hypotheses: int = 1024,
    lo_iterations: int = 4,
    distance_thresh: float = 1000.0,
    sample_size: int = 8,
    refine_iters: int = 8,
):
    """On-device pose. x0n/x1n [N,2] normalized coords, valid [N] bool.
    sample_size=5 uses the Nistér minimal solver (impx/ransac/five_point.py).

    Returns dict(E, R, t, inliers [N] bool, num_inliers). jit-friendly.
    """
    out = estimate_essential_ransac(
        key, x0n, x1n, valid, norm_thresh,
        num_hypotheses=num_hypotheses, lo_iterations=lo_iterations,
        sample_size=sample_size,
    )
    E = out["E"]
    e_mask = out["inliers"]
    # cheirality disambiguation restricted to E-inliers
    # (reference pose_estimation.py:110 decomposes on kpts[E_mask > 0])
    R, t, mask_p, n_good = decompose_essential_mat(
        E, x0n, x1n, distance_thresh=distance_thresh, valid=e_mask)
    if refine_iters > 0:
        from impx.geometry.epipolar import sampson_distance
        from impx.geometry.triangulation import (cheirality_mask,
                                                 triangulate_points)

        t2 = norm_thresh * norm_thresh
        d2 = sampson_distance(x0n, x1n, E)
        w = jnp.where(e_mask, 1.0 / (1.0 + d2 / t2), 0.0)
        R, t = refine_pose_gn(R, t, x0n, x1n, w, iters=refine_iters)
        E = skew_symmetric(t) @ R
        # re-derive the inlier mask at the refined pose: epipolar gate at the
        # base threshold + one cheirality pass (same recipe as the compacted
        # solver below)
        d2 = sampson_distance(x0n, x1n, E)
        e_inl = (d2 < t2) & valid
        P0 = jnp.concatenate([jnp.eye(3), jnp.zeros((3, 1))], axis=1)
        P1 = jnp.concatenate([R, t[:, None]], axis=1)
        pts4d = triangulate_points(P0, P1, x0n, x1n)
        mask_p = cheirality_mask(pts4d, P1, distance_thresh, valid=e_inl)
    return {
        "E": E,
        "R": R,
        "t": t,
        "inliers": mask_p,
        "num_inliers": jnp.sum(mask_p),
        "num_e_inliers": out["num_inliers"],
    }


@functools.partial(jax.jit, static_argnames=("bucket", "num_hypotheses",
                                             "lo_iterations", "sample_size",
                                             "weighted", "refine_iters"))
def estimate_pose_from_matches(
    key,
    x0n,
    x1n,
    indices0,
    mscores0,
    norm_thresh,
    bucket: int = 512,
    num_hypotheses: int = 256,
    lo_iterations: int = 4,
    distance_thresh: float = 1000.0,
    sample_size: int = 5,
    weighted: bool = True,
    refine_iters: int = 8,
    E_init=None,
):
    """Pose from a matcher's output, on device: compact the matched pairs
    into a fixed `bucket` (top-`bucket` by match score), run score-weighted
    (PROSAC-style) RANSAC + cheirality there, and scatter the inlier mask
    back to keypoint indexing. `E_init` (optional [3,3], finite + nonzero)
    warm-starts the local optimization — see estimate_essential_ransac.

    Why: the iterative loop's checkpoints only need the matched pairs
    (typically a few hundred of N=2048 keypoints) — scoring/triangulating all
    N wastes ~4x the work, and score-weighted sampling preserves accuracy at
    a fraction of the uniform hypothesis budget (the two ideas behind
    cv2 USAC_MAGSAC's PROSAC sampler, reference eval/pose_estimation.py:96).

    x0n/x1n [N,2]/[M,2] normalized coords; indices0 [N] (-1 = unmatched);
    mscores0 [N]. Returns dict(E, R, t, inliers [N] bool, num_inliers).
    """
    from impx.geometry.epipolar import sampson_distance
    from impx.geometry.triangulation import cheirality_mask, triangulate_points

    n = x0n.shape[0]
    b = min(bucket, n)
    keym = jnp.where(indices0 > -1, mscores0, -1.0)
    vals, sel = jax.lax.top_k(keym, b)          # [b]
    valid_r = vals > -0.5
    mx0 = x0n[sel]
    mx1 = x1n[jnp.clip(indices0[sel], 0, x1n.shape[0] - 1)]
    w = jnp.where(valid_r, jnp.maximum(vals, 1e-4), 0.0) if weighted else None
    out = estimate_essential_ransac(
        key, mx0, mx1, valid_r, norm_thresh,
        num_hypotheses=num_hypotheses, lo_iterations=lo_iterations,
        sample_size=sample_size, weights=w, E_init=E_init)
    R, t, _, _ = decompose_essential_mat(
        out["E"], mx0, mx1, distance_thresh=distance_thresh,
        valid=out["inliers"])
    E = out["E"]
    if refine_iters > 0:
        # geometric GN polish on the compacted inliers (see refine_pose_gn)
        t2 = norm_thresh * norm_thresh
        d2c = sampson_distance(mx0, mx1, E)
        w = jnp.where(out["inliers"], 1.0 / (1.0 + d2c / t2), 0.0)
        R, t = refine_pose_gn(R, t, mx0, mx1, w, iters=refine_iters)
        E = skew_symmetric(t) @ R

    # the compaction is a solver-internal detail: the returned inlier mask
    # must cover EVERY match (a match-rich pair can have more than `bucket`
    # matches, and the reference keeps all pose-inliers). One full-length
    # Sampson + ONE cheirality pass at the selected pose restores that at a
    # fraction of the 4-hypothesis decomposition cost.
    m_valid = indices0 > -1
    fx1 = x1n[jnp.clip(indices0, 0, x1n.shape[0] - 1)]
    d2 = sampson_distance(x0n, fx1, E)
    e_inl_full = (d2 < norm_thresh * norm_thresh) & m_valid
    P0 = jnp.concatenate([jnp.eye(3), jnp.zeros((3, 1))], axis=1)
    P1 = jnp.concatenate([R, t[:, None]], axis=1)
    pts4d = triangulate_points(P0, P1, x0n, fx1)
    inl_full = cheirality_mask(pts4d, P1, distance_thresh,
                               valid=e_inl_full)
    return {
        "E": E,
        "R": R,
        "t": t,
        "inliers": inl_full,
        "num_inliers": jnp.sum(inl_full),
        "num_e_inliers": out["num_inliers"],
    }


def estimate_pose_cv2(kpts0, kpts1, K0, K1, norm_thresh, conf: float = 0.99999,
                      method: str = "magsac"):
    """Host OpenCV path, protocol-identical to reference estimate_pose
    (eval/pose_estimation.py:92-115) but with our jnp decomposition.

    kpts0/kpts1: [N,2] pixel coordinates. Returns (E, R, t, mask) or None.
    """
    import cv2

    # Preserve the caller's float dtype: cv2's USAC returns a DIFFERENT
    # (deterministic) model for float32 vs float64 inputs of identical
    # values, and the reference feeds its reader's float32 keypoints
    # verbatim (eval/matching.py:84, eval_imp.py:204) — casting here made
    # the two frameworks' pose errors diverge on ~1 in 8 pairs at
    # bit-identical match sets (see impx/eval/pose_delta_probe.py).
    kpts0 = np.ascontiguousarray(kpts0)
    kpts1 = np.ascontiguousarray(kpts1)
    if kpts0.dtype not in (np.float32, np.float64):
        kpts0 = kpts0.astype(np.float64)
    if kpts1.dtype not in (np.float32, np.float64):
        kpts1 = kpts1.astype(np.float64)
    if len(kpts0) < 5:
        return None
    m = cv2.USAC_MAGSAC if method == "magsac" else cv2.RANSAC
    E, E_mask = cv2.findEssentialMat(
        points1=kpts0, points2=kpts1,
        cameraMatrix1=np.asarray(K0, np.float64), cameraMatrix2=np.asarray(K1, np.float64),
        distCoeffs1=None, distCoeffs2=None,
        threshold=norm_thresh, prob=conf, mask=None, method=m,
    )
    if E is None or E.shape[0] != 3 or E.shape[1] != 3:
        return None

    sel = E_mask.ravel() > 0
    # normalize by the averaged intrinsics (reference pose_estimation.py:29-33)
    K = (np.asarray(K0) + np.asarray(K1)) / 2.0
    x0n = (kpts0[sel] - K[:2, 2]) / np.array([K[0, 0], K[1, 1]])
    x1n = (kpts1[sel] - K[:2, 2]) / np.array([K[0, 0], K[1, 1]])
    R, t, mask_p, _ = decompose_essential_mat(
        jnp.asarray(E), jnp.asarray(x0n), jnp.asarray(x1n))
    mask = E_mask.ravel() >= 0
    mask[sel] = np.asarray(mask_p)
    return np.asarray(E), np.asarray(R), np.asarray(t), mask


def estimate_pose(kpts0, kpts1, K0, K1, norm_thresh, conf: float = 0.99999,
                  method: str = "magsac"):
    """Reference-compatible host entry point (pixel inputs, cv2 backend)."""
    return estimate_pose_cv2(kpts0, kpts1, K0, K1, norm_thresh, conf, method)
