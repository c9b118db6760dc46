"""(Weighted) eight-point essential-matrix solver — pure jnp, batched.

TPU-native replacement for the minimal solver inside OpenCV's
findEssentialMat (used by the reference at eval/pose_estimation.py:96-105 and
components/evaluators.py:152-163). The RANSAC driver vmaps this over hundreds
of hypotheses; the final estimate is refined by iteratively-reweighted
least squares on the inlier set (see impx/ransac/ransac.py).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _design_matrix(x0: jax.Array, x1: jax.Array) -> jax.Array:
    """Rows of the epipolar constraint x1h^T E x0h = 0 as A @ vec(E) = 0.

    x0, x1: [N, 2] normalized camera coordinates. Returns [N, 9]:
    [x1*x0, x1*y0, x1, y1*x0, y1*y0, y1, x0, y0, 1].
    """
    x0h = jnp.concatenate([x0, jnp.ones_like(x0[..., :1])], axis=-1)
    x1h = jnp.concatenate([x1, jnp.ones_like(x1[..., :1])], axis=-1)
    return (x1h[..., :, None] * x0h[..., None, :]).reshape(*x0.shape[:-1], 9)


def essential_from_points(
    x0: jax.Array,
    x1: jax.Array,
    weights: jax.Array | None = None,
    project: bool = True,
) -> jax.Array:
    """Least-squares essential matrix from >= 8 correspondences.

    Solves min |W A e| via the smallest eigenvector of A^T W A (9x9 symmetric
    eigendecomposition: cheap and batchable on TPU, unlike an Nx9 SVD), then
    optionally projects onto the essential manifold (singular values
    (s, s, 0) with s the mean of the top two).

    weights: [N] (zero disables a row — doubles as the validity mask).
    """
    A = _design_matrix(x0, x1)  # [N, 9]
    if weights is not None:
        A = A * weights[..., :, None]
    AtA = A.swapaxes(-1, -2) @ A
    # smallest eigenvector of symmetric PSD matrix
    _, V = jnp.linalg.eigh(AtA)
    e = V[..., :, 0]
    E = e.reshape(*e.shape[:-1], 3, 3)
    if project:
        U, S, Vt = jnp.linalg.svd(E)
        s = (S[..., 0] + S[..., 1]) / 2.0
        S_proj = jnp.stack([s, s, jnp.zeros_like(s)], axis=-1)
        E = (U * S_proj[..., None, :]) @ Vt
    # fix scale for numerical comparability
    return E / (jnp.linalg.norm(E, axis=(-2, -1), keepdims=True) + 1e-15)
