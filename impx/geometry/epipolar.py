"""Epipolar geometry: E/F construction and point-to-epipolar-line errors.

Mirrors reference components/utils/metrics.py:51-64 (`compute_epi_inlier`),
tools/utils.py:349-422 (epipolar / Sampson errors) and the E/F construction in
dataset/megadepth.py:218-226. All functions are pure jnp, batched-friendly.
"""
from __future__ import annotations

import jax.numpy as jnp


def skew_symmetric(v):
    """[..., 3] -> [..., 3, 3] cross-product matrix."""
    zero = jnp.zeros_like(v[..., 0])
    rows = [
        jnp.stack([zero, -v[..., 2], v[..., 1]], axis=-1),
        jnp.stack([v[..., 2], zero, -v[..., 0]], axis=-1),
        jnp.stack([-v[..., 1], v[..., 0], zero], axis=-1),
    ]
    return jnp.stack(rows, axis=-2)


def essential_from_pose(R, t):
    """E = [t]_x R from relative pose (0 -> 1). R [...,3,3], t [...,3]."""
    return skew_symmetric(t) @ R


def fundamental_from_essential(E, K0, K1):
    """F = K1^-T E K0^-1."""
    return jnp.linalg.inv(K1).swapaxes(-1, -2) @ E @ jnp.linalg.inv(K0)


def _to_h(x):
    return jnp.concatenate([x, jnp.ones_like(x[..., :1])], axis=-1)


def epipolar_distance(x0, x1, E):
    """Symmetric-normalized epipolar distance used by the eval protocol
    (reference metrics.py:51-64): |x1^T E x0| * mean(1/|l1|, 1/|l0|).

    x0, x1: [..., N, 2] in *normalized camera* coordinates; E [..., 3, 3].
    """
    x0h = _to_h(x0)
    x1h = _to_h(x1)
    l1 = x0h @ E.swapaxes(-1, -2)  # epipolar line of x0 in image 1
    l0 = x1h @ E
    norm = (
        1.0 / jnp.sqrt(jnp.sum(l1[..., :2] ** 2, axis=-1) + 1e-15)
        + 1.0 / jnp.sqrt(jnp.sum(l0[..., :2] ** 2, axis=-1) + 1e-15)
    ) / 2.0
    return jnp.abs(jnp.sum(l1 * x1h, axis=-1)) * norm


def compute_epi_inlier(x0, x1, E, inlier_th, return_error: bool = False):
    dis = epipolar_distance(x0, x1, E)
    mask = dis < inlier_th
    if return_error:
        return mask, dis
    return mask


def compute_epi_inlier_np(x0, x1, E, inlier_th, return_error: bool = False):
    """Numpy twin of compute_epi_inlier for host-side eval loops."""
    import numpy as np

    x0 = np.asarray(x0, np.float64)
    x1 = np.asarray(x1, np.float64)
    E = np.asarray(E, np.float64)
    x0h = np.concatenate([x0, np.ones_like(x0[:, :1])], axis=-1)
    x1h = np.concatenate([x1, np.ones_like(x1[:, :1])], axis=-1)
    l1 = x0h @ E.T
    l0 = x1h @ E
    norm = (1.0 / np.sqrt((l1[:, :2] ** 2).sum(1) + 1e-15)
            + 1.0 / np.sqrt((l0[:, :2] ** 2).sum(1) + 1e-15)) / 2.0
    dis = np.abs((l1 * x1h).sum(-1)) * norm
    mask = dis < inlier_th
    if return_error:
        return mask, dis
    return mask


def pairwise_epipolar_distance(x0, x1, E):
    """All-pairs symmetric-normalized epipolar distance matrix.

    Same metric as `epipolar_distance` (reference metrics.py:51-64) but over
    every (i, j) keypoint combination — the weighting matrix of the
    geometry-supervised (_geo) training loss (reference nets/loss.py:125-126
    hook + the IMP paper's pose-consistency supervision).

    x0 [..., N, 2], x1 [..., M, 2] in normalized camera coordinates;
    E [..., 3, 3] with x1ᵀ E x0 = 0. Returns [..., N, M].
    """
    x0h = _to_h(x0)
    x1h = _to_h(x1)
    l1 = x0h @ E.swapaxes(-1, -2)  # [..., N, 3] epipolar lines in image 1
    l0 = x1h @ E                   # [..., M, 3] epipolar lines in image 0
    s = l1 @ x1h.swapaxes(-1, -2)  # [..., N, M]: x1h_j . (E x0h_i)
    n1 = 1.0 / jnp.sqrt(jnp.sum(l1[..., :2] ** 2, axis=-1) + 1e-15)  # [..., N]
    n0 = 1.0 / jnp.sqrt(jnp.sum(l0[..., :2] ** 2, axis=-1) + 1e-15)  # [..., M]
    return jnp.abs(s) * (n1[..., :, None] + n0[..., None, :]) / 2.0


def normalize_by_intrinsics(kpts, K):
    """Pixel keypoints [..., N, 2] -> normalized camera coordinates via
    K^-1 (zero-skew pinhole: subtract principal point, divide by focal)."""
    f = jnp.stack([K[..., 0, 0], K[..., 1, 1]], axis=-1)  # [..., 2]
    c = jnp.stack([K[..., 0, 2], K[..., 1, 2]], axis=-1)
    return (kpts - c[..., None, :]) / f[..., None, :]


def sampson_distance(x0, x1, E):
    """Squared Sampson distance (first-order geometric error).

    x0, x1: [..., N, 2] normalized coordinates; E [..., 3, 3].
    """
    x0h = _to_h(x0)
    x1h = _to_h(x1)
    Ex0 = x0h @ E.swapaxes(-1, -2)  # [N,3]
    Etx1 = x1h @ E
    num = jnp.sum(x1h * Ex0, axis=-1) ** 2
    den = Ex0[..., 0] ** 2 + Ex0[..., 1] ** 2 + Etx1[..., 0] ** 2 + Etx1[..., 1] ** 2
    return num / (den + 1e-15)
