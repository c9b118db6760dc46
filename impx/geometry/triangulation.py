"""Triangulation, essential-matrix decomposition, cheirality — pure jnp.

TPU-native replacements for the OpenCV calls in the reference
(cv2.triangulatePoints / cv2.decomposeEssentialMat used at
eval/pose_estimation.py:13-89 and components/evaluators.py:13-89): closed-form
SVD decomposition + batched DLT triangulation, so the pose pipeline can run
fully on device.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def triangulate_points(P0, P1, x0, x1):
    """DLT triangulation (cv2.triangulatePoints semantics).

    P0, P1: [3,4] projection matrices; x0, x1: [N,2] points. Returns [N,4]
    homogeneous points (the right singular vector of the 4x4 design matrix).
    """
    def build_A(p0, p1):
        return jnp.stack(
            [
                p0[0] * P0[2] - P0[0],
                p0[1] * P0[2] - P0[1],
                p1[0] * P1[2] - P1[0],
                p1[1] * P1[2] - P1[1],
            ]
        )

    A = jax.vmap(build_A)(x0, x1)  # [N,4,4]
    # smallest right singular vector = smallest eigenvector of A^T A by
    # inverse iteration (batched Cholesky + triangular solves). XLA's batched
    # small SVD is an iterative Jacobi loop that dominated the on-device
    # RANSAC checkpoint (N x 4 pose hypotheses x pairs of 4x4 SVDs).
    from impx.ransac.eight_point import _smallest_eigvec

    AtA = A.swapaxes(-1, -2) @ A
    return _smallest_eigvec(AtA)


def cheirality_mask(pts4d, P, distance_thresh: float = 1000.0, valid=None):
    """Positive-depth / finite-distance mask for triangulated points.

    Mirrors get_mask_from_pts4D (reference eval/pose_estimation.py:14-27):
    depth in cam0 positive and < thresh, and reprojected depth in cam1
    positive and < thresh.
    """
    Q = pts4d  # [N,4]
    mask = (Q[:, 2] * Q[:, 3]) > 0
    z0 = Q[:, 2] / jnp.where(Q[:, 3] == 0, 1e-15, Q[:, 3])
    mask = mask & (z0 < distance_thresh)
    Qn = Q / jnp.where(Q[:, 3:4] == 0, 1e-15, Q[:, 3:4])
    z1 = (Qn @ P.T)[:, 2]
    mask = mask & (z1 > 0) & (z1 < distance_thresh)
    if valid is not None:
        mask = mask & valid
    return mask


def decompose_E(E):
    """E -> (R1, R2, t) candidates (cv2.decomposeEssentialMat semantics)."""
    U, _, Vt = jnp.linalg.svd(E)
    # enforce proper rotations
    U = U * jnp.sign(jnp.linalg.det(U))
    Vt = Vt * jnp.sign(jnp.linalg.det(Vt))
    W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], E.dtype)
    R1 = U @ W @ Vt
    R2 = U @ W.T @ Vt
    t = U[:, 2]
    return R1, R2, t


def _P_from(R, t):
    return jnp.concatenate([R, t[:, None]], axis=1)


def decompose_essential_mat(E, x0, x1, distance_thresh: float = 1000.0, valid=None):
    """Pick the (R, t) among {R1,R2}x{t,-t} with the most cheirality inliers.

    x0, x1: [N,2] *normalized camera* coordinates (the reference normalizes by
    the averaged intrinsics before this step, pose_estimation.py:29-33).
    Returns (R, t, mask, n_good). Fully batched/jit-friendly (no data-dependent
    control flow: evaluates all four hypotheses and selects by count —
    tie-breaking order matches the reference's good1>=good2>=good3>=good4
    preference at pose_estimation.py:80-89).
    """
    R1, R2, t = decompose_E(E)
    P0 = jnp.concatenate([jnp.eye(3, dtype=E.dtype), jnp.zeros((3, 1), E.dtype)], axis=1)

    Rs = jnp.stack([R1, R2, R1, R2])
    ts = jnp.stack([t, t, -t, -t])

    def hyp(R, tt):
        P = _P_from(R, tt)
        pts4d = triangulate_points(P0, P, x0, x1)
        mask = cheirality_mask(pts4d, P, distance_thresh, valid=valid)
        return mask, jnp.sum(mask)

    masks, goods = jax.vmap(hyp)(Rs, ts)
    # argmax returns the first max -> same preference order as the reference
    best = jnp.argmax(goods)
    return Rs[best], ts[best], masks[best], goods[best]
