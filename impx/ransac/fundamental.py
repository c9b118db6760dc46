"""On-device fundamental-matrix RANSAC (FM-Bench's cv2.findFundamentalMat
replacement, reference components/evaluators.py:216-220).

Same hypothesize-and-verify machinery as the essential RANSAC but with the
normalized 8-point solver + rank-2 projection, operating on pixel coordinates
(with Hartley normalization for conditioning).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from impx.ransac.eight_point import _design_matrix
from impx.ransac.ransac import _sample_minimal_sets


def _hartley_normalize(x, valid):
    f = valid.astype(x.dtype)[:, None]
    count = jnp.maximum(jnp.sum(f), 1.0)
    mean = jnp.sum(x * f, axis=0) / count
    d = jnp.sqrt(jnp.sum(((x - mean) ** 2) * f, axis=-1).sum() / count + 1e-12)
    s = jnp.sqrt(2.0) / (d + 1e-12)
    T = jnp.array([[s, 0, -s * mean[0]], [0, s, -s * mean[1]], [0, 0, 1.0]], x.dtype)
    return (x - mean) * s, T


def fundamental_from_points(x0, x1, weights=None):
    """Least-squares F (rank-2 projected) from >= 8 correspondences."""
    A = _design_matrix(x0, x1)
    if weights is not None:
        A = A * weights[..., :, None]
    AtA = A.swapaxes(-1, -2) @ A
    _, V = jnp.linalg.eigh(AtA)
    F = V[..., :, 0].reshape(*AtA.shape[:-2], 3, 3)
    U, S, Vt = jnp.linalg.svd(F)
    S = S.at[..., 2].set(0.0)
    F = (U * S[..., None, :]) @ Vt
    return F / (jnp.linalg.norm(F, axis=(-2, -1), keepdims=True) + 1e-15)


def _sym_epi_dist2(x0, x1, F):
    """Squared symmetric epipolar distance in pixels."""
    x0h = jnp.concatenate([x0, jnp.ones_like(x0[..., :1])], axis=-1)
    x1h = jnp.concatenate([x1, jnp.ones_like(x1[..., :1])], axis=-1)
    l1 = x0h @ F.swapaxes(-1, -2)
    l0 = x1h @ F
    num = jnp.sum(x1h * l1, axis=-1) ** 2
    d1 = num / (l1[..., 0] ** 2 + l1[..., 1] ** 2 + 1e-15)
    d0 = num / (l0[..., 0] ** 2 + l0[..., 1] ** 2 + 1e-15)
    return jnp.maximum(d0, d1)


@partial(jax.jit, static_argnames=("num_hypotheses", "lo_iterations"))
def estimate_fundamental_ransac(
    key, x0, x1, valid, threshold_px: float = 1.0,
    num_hypotheses: int = 1024, lo_iterations: int = 3,
):
    """x0, x1 [N,2] pixel coords; returns dict(F, inliers, num_inliers)."""
    x0n, T0 = _hartley_normalize(x0, valid)
    x1n, T1 = _hartley_normalize(x1, valid)
    t2 = threshold_px * threshold_px

    idx = _sample_minimal_sets(key, valid, num_hypotheses, 8)
    Fs_n = fundamental_from_points(x0n[idx], x1n[idx])
    # denormalize: F = T1^T Fn T0
    Fs = jnp.einsum("ji,hjk,kl->hil", T1, Fs_n, T0)

    def score(F):
        d2 = _sym_epi_dist2(x0, x1, F)
        inl = (d2 < t2) & valid
        gain = jnp.sum(jnp.where(valid, jnp.maximum(0.0, 1.0 - d2 / t2), 0.0))
        return gain, inl

    gains, _ = jax.vmap(lambda F: score(F))(Fs)
    F = Fs[jnp.argmax(gains)]

    def lo_body(_, F):
        d2 = _sym_epi_dist2(x0, x1, F)
        w = jnp.where((d2 < t2) & valid, 1.0 / (1.0 + d2 / t2), 0.0)
        Fn_new = fundamental_from_points(x0n, x1n, weights=w)
        F_new = T1.T @ Fn_new @ T0
        g_old, _ = score(F)
        g_new, _ = score(F_new)
        return jnp.where(g_new >= g_old, F_new, F)

    F = jax.lax.fori_loop(0, lo_iterations, lo_body, F)
    gain, inliers = score(F)
    return {"F": F / (jnp.linalg.norm(F) + 1e-15), "inliers": inliers,
            "num_inliers": jnp.sum(inliers)}
