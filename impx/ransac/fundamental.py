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


def _cubic_roots(c3, c2, c1, c0):
    """Real roots of c3 x^3 + c2 x^2 + c1 x + c0 per batch element.

    Returns (roots [..., 3], ok [..., 3]). Closed-form (trig/Cardano) with
    two Newton polish steps; when |c3| is negligible the quadratic roots are
    returned in slots 0/1. Spurious roots are harmless downstream — every
    candidate model is scored and bad ones lose."""
    tiny = 1e-12
    quad = jnp.abs(c3) < tiny * (jnp.abs(c2) + jnp.abs(c1) + jnp.abs(c0) + 1.0)
    c3s = jnp.where(quad, 1.0, c3)

    b, c, d = c2 / c3s, c1 / c3s, c0 / c3s
    # depressed cubic t^3 + p t + q, x = t - b/3
    p = c - b * b / 3.0
    q = 2.0 * b ** 3 / 27.0 - b * c / 3.0 + d
    disc = (q / 2.0) ** 2 + (p / 3.0) ** 3

    # three-real-root (trig) branch
    pr = jnp.minimum(p, -tiny)
    m = 2.0 * jnp.sqrt(-pr / 3.0)
    arg = jnp.clip(3.0 * q / (pr * m), -1.0, 1.0)
    theta = jnp.arccos(arg) / 3.0
    k = jnp.arange(3.0)
    t_trig = m[..., None] * jnp.cos(theta[..., None] - 2.0 * jnp.pi * k / 3.0)

    # one-real-root (Cardano) branch
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    u = jnp.cbrt(-q / 2.0 + sq)
    v = jnp.cbrt(-q / 2.0 - sq)
    t_card = (u + v)[..., None] * jnp.ones_like(k)

    three = disc < 0.0
    t = jnp.where(three[..., None], t_trig, t_card)
    x = t - (b / 3.0)[..., None]
    ok = three[..., None] | (k == 0.0)

    # quadratic fallback: c2 x^2 + c1 x + c0
    c2s = jnp.where(jnp.abs(c2) < tiny, 1.0, c2)
    qd = c1 * c1 - 4.0 * c2 * c0
    sqq = jnp.sqrt(jnp.maximum(qd, 0.0))
    xq = jnp.stack([(-c1 + sqq) / (2.0 * c2s),
                    (-c1 - sqq) / (2.0 * c2s),
                    jnp.zeros_like(c1)], axis=-1)
    okq = jnp.stack([qd >= 0, qd >= 0, jnp.zeros_like(qd, bool)], axis=-1)
    x = jnp.where(quad[..., None], xq, x)
    ok = jnp.where(quad[..., None], okq, ok)

    # Newton polish on the ORIGINAL cubic (fp32 closed forms drift)
    for _ in range(2):
        f = ((c3[..., None] * x + c2[..., None]) * x + c1[..., None]) * x \
            + c0[..., None]
        fp = (3.0 * c3[..., None] * x + 2.0 * c2[..., None]) * x + c1[..., None]
        x = x - f / jnp.where(jnp.abs(fp) < tiny, tiny, fp)
    return x, ok & jnp.isfinite(x)


def solve_fundamental_7pt(x0, x1):
    """Batched 7-point minimal solver (the solver behind cv2's F MAGSAC):
    2-dim null space of the [7,9] design matrix, det(F1 + lam F2) = 0 cubic,
    up to 3 real F per sample.

    x0, x1: [H, 7, 2] (pre-normalized coords). Returns (F [H, 3, 3, 3],
    ok [H, 3])."""
    A = _design_matrix(x0, x1)                       # [H, 7, 9]
    AtA = A.swapaxes(-1, -2) @ A
    _, V = jnp.linalg.eigh(AtA)
    F1 = V[..., :, 0].reshape(-1, 3, 3)
    F2 = V[..., :, 1].reshape(-1, 3, 3)

    # cubic coefficients by evaluating det(F1 + lam F2) at 4 nodes (exact
    # for a cubic; avoids expanding 3x3 determinant cofactors symbolically)
    lams = jnp.array([0.0, 1.0, -1.0, 2.0])
    dets = jnp.stack([jnp.linalg.det(F1 + l * F2) for l in lams])  # [4, H]
    Vm = jnp.stack([lams ** 0, lams, lams ** 2, lams ** 3], axis=1)
    coef = jnp.linalg.solve(Vm, dets)                # [4, H]: c0, c1, c2, c3
    roots, ok = _cubic_roots(coef[3], coef[2], coef[1], coef[0])  # [H,3]

    F = F1[:, None] + roots[..., None, None] * F2[:, None]        # [H,3,3,3]
    F = F / (jnp.linalg.norm(F, axis=(-2, -1), keepdims=True) + 1e-15)
    return F, ok


def _score_f(F, x0, x1, valid, t2, sigmas=(1.0, 2.0)):
    """Sigma-marginalized truncated gain + base-threshold inlier mask
    (same cheap MAGSAC sigma-consensus as impx/ransac/ransac.py:_score)."""
    d2 = _sym_epi_dist2(x0, x1, F)
    inl = (d2 < t2) & valid
    gain = sum(
        jnp.sum(jnp.where(valid,
                          jnp.maximum(0.0, 1.0 - d2 / (t2 * s * s)), 0.0),
                axis=-1) / s
        for s in sigmas)
    return gain, inl


@partial(jax.jit, static_argnames=("num_hypotheses", "lo_iterations",
                                   "sample_size", "score_sigmas",
                                   "lo_anneal", "lo_starts"))
def estimate_fundamental_ransac(
    key, x0, x1, valid, threshold_px: float = 1.0,
    num_hypotheses: int = 1024, lo_iterations: int = 8,
    sample_size: int = 7, score_sigmas: tuple = (1.0, 2.0, 3.0),
    lo_anneal: float = 8.0, lo_starts: int = 8,
):
    """x0, x1 [N,2] pixel coords; returns dict(F, inliers, num_inliers).

    Defaults mirror the essential-RANSAC accuracy work: 7-point minimal
    sets (cv2 MAGSAC's F solver — less noise contamination than 8-point),
    sigma-marginalized scoring, annealed multi-start IRLS LO. The wide
    anneal (8x threshold) matters when the true noise exceeds the 1 px
    threshold — A/B'd on the fm_study grid (2 px noise / 50% outliers:
    GT-inlier rate 55 -> 68, beating cv2 MAGSAC's 62 at matched budgets)."""
    x0n, T0 = _hartley_normalize(x0, valid)
    x1n, T1 = _hartley_normalize(x1, valid)
    t2 = threshold_px * threshold_px

    idx = _sample_minimal_sets(key, valid, num_hypotheses, sample_size)
    if sample_size == 7:
        Fs_n, ok = solve_fundamental_7pt(x0n[idx], x1n[idx])   # [H,3,3,3]
        Fs_n = Fs_n.reshape(-1, 3, 3)
        Fs = jnp.einsum("ji,hjk,kl->hil", T1, Fs_n, T0)
        gains, _ = jax.vmap(
            lambda F: _score_f(F, x0, x1, valid, t2, score_sigmas))(Fs)
        gains = jnp.where(ok.reshape(-1), gains, -jnp.inf)
    else:
        Fs_n = fundamental_from_points(x0n[idx], x1n[idx])
        # denormalize: F = T1^T Fn T0
        Fs = jnp.einsum("ji,hjk,kl->hil", T1, Fs_n, T0)
        gains, _ = jax.vmap(
            lambda F: _score_f(F, x0, x1, valid, t2, score_sigmas))(Fs)

    # annealed multi-start IRLS LO (LO-RANSAC; see ransac.py for rationale)
    def lo_body(i, carry):
        F, g = carry
        frac = (lo_iterations - 1.0 - i) / max(lo_iterations - 1.0, 1.0)
        m2 = (1.0 + (lo_anneal - 1.0) * frac) ** 2
        d2 = _sym_epi_dist2(x0, x1, F)
        w = jnp.where((d2 < t2 * m2) & valid, 1.0 / (1.0 + d2 / (t2 * m2)), 0.0)
        n_in = jnp.sum(w > 0)
        Fn_new = fundamental_from_points(x0n, x1n, weights=w)
        F_new = T1.T @ Fn_new @ T0
        g_new, _ = _score_f(F_new, x0, x1, valid, t2, score_sigmas)
        better = (g_new >= g) & (n_in >= 8)
        return jnp.where(better, F_new, F), jnp.where(better, g_new, g)

    def lo_chain(F0):
        g0, _ = _score_f(F0, x0, x1, valid, t2, score_sigmas)
        return jax.lax.fori_loop(0, lo_iterations, lo_body, (F0, g0))

    top_g, top_i = jax.lax.top_k(gains, min(lo_starts, gains.shape[0]))
    Fs_f, gs_f = jax.vmap(lo_chain)(Fs[top_i])
    F = Fs_f[jnp.argmax(gs_f)]
    gain, inliers = _score_f(F, x0, x1, valid, t2, score_sigmas)
    return {"F": F / (jnp.linalg.norm(F) + 1e-15), "inliers": inliers,
            "num_inliers": jnp.sum(inliers)}
