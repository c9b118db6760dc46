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


def _smallest_eigvec(M: jax.Array, iterations: int = 16) -> jax.Array:
    """Smallest eigenvector of a batched symmetric PSD [..., 9, 9] matrix by
    INVERSE iteration: one Cholesky factorization of (M + eps·I), then a few
    triangular solves. Converges at rate (λ_min+eps)/(λ_2+eps) per step
    (λ_min ≈ 0 for minimal 8-point samples, so a handful of steps suffice).
    On TPU this is far faster than batched jnp.linalg.eigh, whose Jacobi
    sweeps dominate the RANSAC checkpoint."""
    d = M.shape[-1]
    eps = 1e-6 * jnp.trace(M, axis1=-2, axis2=-1)[..., None, None] + 1e-12
    L = jnp.linalg.cholesky(M + eps * jnp.eye(d, dtype=M.dtype))
    # guard non-finite factorizations (degenerate samples): substitute I
    bad = ~jnp.all(jnp.isfinite(L), axis=(-2, -1), keepdims=True)
    L = jnp.where(bad, jnp.eye(d, dtype=M.dtype), L)
    x = jnp.broadcast_to(
        jnp.arange(1.0, d + 1.0, dtype=M.dtype) / d, M.shape[:-2] + (d,))

    def body(_, x):
        y = jax.lax.linalg.triangular_solve(
            L, x[..., None], left_side=True, lower=True)
        z = jax.lax.linalg.triangular_solve(
            L, y, left_side=True, lower=True, transpose_a=True)[..., 0]
        return z / (jnp.linalg.norm(z, axis=-1, keepdims=True) + 1e-30)

    return jax.lax.fori_loop(0, iterations, body, x)


def _inv3_scaled(M):
    """(adjugate(M)^T / det, det) — closed-form 3x3 inverse pieces."""
    a = M

    def c(i0, i1, j0, j1):
        return (a[..., i0, j0] * a[..., i1, j1]
                - a[..., i0, j1] * a[..., i1, j0])

    # cofactor matrix C with C[i,j] = (-1)^{i+j} minor(i,j); inv = C^T / det
    C00, C01, C02 = c(1, 2, 1, 2), -c(1, 2, 0, 2), c(1, 2, 0, 1)
    C10, C11, C12 = -c(0, 2, 1, 2), c(0, 2, 0, 2), -c(0, 2, 0, 1)
    C20, C21, C22 = c(0, 1, 1, 2), -c(0, 1, 0, 2), c(0, 1, 0, 1)
    det = a[..., 0, 0] * C00 + a[..., 0, 1] * C01 + a[..., 0, 2] * C02
    adjT = jnp.stack([
        jnp.stack([C00, C10, C20], axis=-1),
        jnp.stack([C01, C11, C21], axis=-1),
        jnp.stack([C02, C12, C22], axis=-1),
    ], axis=-2)
    return adjT, det


def _polar_q(E, iterations: int = 8):
    """Orthogonal polar factor Q of batched 3x3 E by determinant-scaled
    Newton: X <- (g X + X^{-T}/g)/2, g = |det X|^{-1/3}. Closed-form inverse,
    no SVD."""
    X = E / (jnp.linalg.norm(E, axis=(-2, -1), keepdims=True) + 1e-20)

    def body(_, X):
        adjT, det = _inv3_scaled(X)
        det = jnp.where(jnp.abs(det) < 1e-20, 1e-20, det)
        inv_t = adjT.swapaxes(-1, -2) / det[..., None, None]
        g = jnp.abs(det) ** (-1.0 / 3.0)
        return 0.5 * (g[..., None, None] * X + inv_t / g[..., None, None])

    return jax.lax.fori_loop(0, iterations, body, X)


def _smallest_eigvec3_sym(S):
    """Smallest eigenvector of batched SYMMETRIC 3x3 via the trigonometric
    eigenvalue formula + cross-product null direction. Fully closed-form."""
    q = jnp.trace(S, axis1=-2, axis2=-1) / 3.0
    D = S - q[..., None, None] * jnp.eye(3, dtype=S.dtype)
    p = jnp.sqrt(jnp.maximum(jnp.sum(D * D, axis=(-2, -1)) / 6.0, 1e-30))
    B = D / p[..., None, None]
    _, detB = _inv3_scaled(B)
    r = jnp.clip(detB / 2.0, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    lam_min = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)

    A = S - lam_min[..., None, None] * jnp.eye(3, dtype=S.dtype)
    r0, r1, r2 = A[..., 0, :], A[..., 1, :], A[..., 2, :]
    cands = jnp.stack([jnp.cross(r0, r1), jnp.cross(r0, r2),
                       jnp.cross(r1, r2)], axis=-2)          # [..., 3, 3]
    norms = jnp.linalg.norm(cands, axis=-1)
    best = jnp.argmax(norms, axis=-1)
    v = jnp.take_along_axis(cands, best[..., None, None].repeat(3, -1),
                            axis=-2)[..., 0, :]
    return v / (jnp.linalg.norm(v, axis=-1, keepdims=True) + 1e-30)


def project_essential(E):
    """Closed-form projection of batched 3x3 matrices onto the essential
    manifold (singular values (s, s, 0), s = mean of the top two): with polar
    decomposition E = Q·S, the projection is ((tr S − λ3)/2)·Q·(I − v3 v3^T)
    where (λ3, v3) is S's smallest eigenpair. No batched SVD — XLA's Jacobi
    SVD loop dominated the on-device RANSAC otherwise."""
    Q = _polar_q(E)
    S = Q.swapaxes(-1, -2) @ E
    S = 0.5 * (S + S.swapaxes(-1, -2))
    v3 = _smallest_eigvec3_sym(S)
    lam3 = jnp.einsum("...i,...ij,...j->...", v3, S, v3)
    sbar = 0.5 * (jnp.trace(S, axis1=-2, axis2=-1) - lam3)
    P = jnp.eye(3, dtype=E.dtype) - v3[..., :, None] * v3[..., None, :]
    out = sbar[..., None, None] * (Q @ P)
    # degenerate inputs (det ~ 0 polar failures): keep the unprojected E
    ok = jnp.all(jnp.isfinite(out), axis=(-2, -1), keepdims=True)
    return jnp.where(ok, out, E)


def essential_from_points(
    x0: jax.Array,
    x1: jax.Array,
    weights: jax.Array | None = None,
    project: bool = True,
) -> jax.Array:
    """Least-squares essential matrix from >= 8 correspondences.

    Solves min |W A e| via the smallest eigenvector of A^T W A (inverse
    iteration on a Cholesky factorization; see _smallest_eigvec), then
    optionally projects onto the essential manifold (singular values
    (s, s, 0) with s the mean of the top two). Hypothesis generators pass
    project=False: scoring tolerates near-essential candidates, and the 3x3
    SVDs would otherwise dominate on TPU.

    weights: [N] (zero disables a row — doubles as the validity mask).
    """
    A = _design_matrix(x0, x1)  # [N, 9]
    if weights is not None:
        A = A * weights[..., :, None]
    AtA = A.swapaxes(-1, -2) @ A
    e = _smallest_eigvec(AtA)
    E = e.reshape(*e.shape[:-1], 3, 3)
    if project:
        E = project_essential(E)
    # fix scale for numerical comparability
    return E / (jnp.linalg.norm(E, axis=(-2, -1), keepdims=True) + 1e-15)
