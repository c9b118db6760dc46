"""Batched Nistér 5-point minimal solver for the essential matrix (TPU).

Replaces the 5-point solver inside cv2.findEssentialMat(USAC_MAGSAC)
(reference eval/pose_estimation.py:96-105) with a fixed-shape, fully batched
jnp implementation so minimal-solver hypotheses can be generated on device
inside RANSAC (impx/ransac/ransac.py) — including inside the iterative
match<->pose loop.

Derivation (Nistér, "An efficient solution to the five-point relative pose
problem", PAMI 2004 — re-derived here symbolically, no ported code):

  1. The 5 epipolar constraints x1ᵀ E x0 = 0 give a 5x9 system; its 4-dim
     null space {X, Y, Z, W} parameterizes E = x·X + y·Y + z·Z + W.
  2. det(E) = 0 and the trace constraint 2·E·Eᵀ·E − tr(E·Eᵀ)·E = 0 yield 10
     cubic polynomial equations in (x, y, z). The polynomial expansion is
     performed SYMBOLICALLY AT TRACE TIME over monomial dictionaries whose
     coefficients are batched jnp arrays — so there is no hand-maintained
     10x20 coefficient table.
  3. Gauss-Jordan elimination (a batched 10x10 solve) expresses the 10
     monomials containing x², y², xy in terms of the remaining 10; pairing
     z-shifted rows gives 3 equations  x·pxᵣ(z) + y·pyᵣ(z) + p1ᵣ(z) = 0 with
     deg(px, py) = 3, deg(p1) = 4; a non-trivial (x, y, 1) solution requires
     det = 0 — a degree-10 polynomial n(z).
  4. Real roots of n are isolated on the tangent-projective grid
     z = tan(θ), g(θ) = n(tan θ)·cos¹⁰θ (polynomial in sin/cos, no overflow
     at large |z|), then polished by bisection — fixed-shape, no
     eigendecomposition (TPU has no nonsymmetric eig).
  5. (x, y) per root by least squares on the 3x2 system; E assembled from the
     null-space basis.

Returns up to R=10 candidate essential matrices per problem with a validity
mask; degenerate samples yield masked slots (callers score-and-max over
hypotheses, so invalid slots simply never win).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

# monomial order: all 20 monomials of total degree <= 3 in (x, y, z).
# LEFT: the 10 containing x², y² or xy (eliminated); RIGHT: the rest.
_LEFT = [(3, 0, 0), (0, 3, 0), (2, 1, 0), (1, 2, 0), (2, 0, 1),
         (2, 0, 0), (0, 2, 1), (0, 2, 0), (1, 1, 1), (1, 1, 0)]
_RIGHT = [(1, 0, 2), (1, 0, 1), (1, 0, 0), (0, 1, 2), (0, 1, 1),
          (0, 1, 0), (0, 0, 3), (0, 0, 2), (0, 0, 1), (0, 0, 0)]
# row indices (into the equation list after G-J) used for the z-pairing:
# LEFT[4] = x²z, LEFT[5] = x²; LEFT[6] = y²z, LEFT[7] = y²;
# LEFT[8] = xyz, LEFT[9] = xy.

MAX_ROOTS = 10


def _pmul(p: dict, q: dict) -> dict:
    out: dict = {}
    for m1, c1 in p.items():
        for m2, c2 in q.items():
            m = (m1[0] + m2[0], m1[1] + m2[1], m1[2] + m2[2])
            out[m] = out[m] + c1 * c2 if m in out else c1 * c2
    return out


def _padd(p: dict, q: dict, sq: float = 1.0) -> dict:
    out = dict(p)
    for m, c in q.items():
        out[m] = out[m] + sq * c if m in out else sq * c
    return out


def _epipolar_system(x0: jax.Array, x1: jax.Array) -> jax.Array:
    """[..., 5, 9] epipolar system (x1ᵀ E x0 row layout: E flattened
    row-major, constraint rows kron(x1h, x0h))."""
    ones = jnp.ones(x0.shape[:-1] + (1,), x0.dtype)
    p0 = jnp.concatenate([x0, ones], axis=-1)  # [..., 5, 3]
    p1 = jnp.concatenate([x1, ones], axis=-1)
    # A[..., i, 3*r+c] = p1[i, r] * p0[i, c]
    return (p1[..., :, :, None] * p0[..., :, None, :]).reshape(
        *x0.shape[:-2], 5, 9)


def _null_basis_svd(x0: jax.Array, x1: jax.Array):
    """SVD null space — the numerical oracle (batched SVD is an iterative
    Jacobi chain on TPU: accurate but the latency bottleneck of the whole
    5-point solve; production uses the Householder path below)."""
    A = _epipolar_system(x0, x1)
    _, _, vt = jnp.linalg.svd(A, full_matrices=True)
    basis = vt[..., 5:9, :]                      # [..., 4, 9]
    return basis.reshape(*basis.shape[:-1], 3, 3)  # [..., 4, 3, 3] = X, Y, Z, W


def _null_basis(x0: jax.Array, x1: jax.Array):
    """Null-space basis of the 5x9 epipolar system via 5 Householder
    reflections (QR of Aᵀ): Aᵀ = QR with Q [..., 9, 9] orthogonal, so
    columns 5..8 of Q are an orthonormal basis of null(A).

    Why not SVD: jnp.linalg.svd on [..., 5, 9] lowers to an iterative Jacobi
    sweep on TPU — hundreds of serialized tiny ops per RANSAC checkpoint.
    Five static rank-1 Householder updates are ~10 small fused matmuls with
    no data-dependent iteration at all. Degenerate samples (rank < 5) leave
    a near-zero R diagonal; their candidates simply score low in RANSAC —
    the same contract as the SVD path."""
    A = _epipolar_system(x0, x1)
    dt = A.dtype
    M = jnp.swapaxes(A, -1, -2)                  # [..., 9, 5]
    batch = M.shape[:-2]
    Q = jnp.broadcast_to(jnp.eye(9, dtype=dt), batch + (9, 9))
    rows = jnp.arange(9)
    for k in range(5):
        x = jnp.where(rows >= k, M[..., :, k], 0.0)          # [..., 9]
        nrm = jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True))
        xk = x[..., k:k + 1]
        sign = jnp.where(xk >= 0, 1.0, -1.0)
        e_k = (rows == k).astype(dt)
        v = x + sign * nrm * e_k
        vn = jnp.sqrt(jnp.sum(v * v, axis=-1, keepdims=True))
        # zero column (degenerate sample): skip the reflection cleanly
        v = jnp.where(vn > 1e-20, v / jnp.maximum(vn, 1e-20), 0.0)
        # M <- H M ; Q <- Q H   (H = I − 2 v vᵀ)
        M = M - 2.0 * v[..., :, None] * jnp.einsum("...r,...rc->...c",
                                                   v, M)[..., None, :]
        Q = Q - 2.0 * jnp.einsum("...rc,...c->...r", Q, v)[..., :, None] \
            * v[..., None, :]
    basis = jnp.swapaxes(Q[..., :, 5:9], -1, -2)  # [..., 4, 9]
    return basis.reshape(*basis.shape[:-1], 3, 3)  # [..., 4, 3, 3]


def _sym_cmul(c1: dict, c2: dict) -> dict:
    """Product of two symbolic coefficients (dict: sorted basis-index tuple
    -> float)."""
    out: dict = {}
    for t1, v1 in c1.items():
        for t2, v2 in c2.items():
            t = tuple(sorted(t1 + t2))
            out[t] = out.get(t, 0.0) + v1 * v2
    return out


def _sym_cadd(a: dict, b: dict, s: float = 1.0) -> dict:
    out = dict(a)
    for t, v in b.items():
        out[t] = out.get(t, 0.0) + s * v
    return out


def _sym_pmul(p: dict, q: dict) -> dict:
    out: dict = {}
    for m1, c1 in p.items():
        for m2, c2 in q.items():
            m = (m1[0] + m2[0], m1[1] + m2[1], m1[2] + m2[2])
            c = _sym_cmul(c1, c2)
            out[m] = _sym_cadd(out[m], c) if m in out else c
    return out


def _sym_padd(p: dict, q: dict, s: float = 1.0) -> dict:
    out = dict(p)
    for m, c in q.items():
        out[m] = (_sym_cadd(out[m], c, s) if m in out
                  else {t: s * v for t, v in c.items()})
    return out


import functools


@functools.lru_cache(maxsize=None)
def _equation_table():
    """The entire symbolic expansion of the 10 cubic equations, precomputed
    ONCE as a static sparse table over the 36 null-basis entries.

    Why: performing the expansion over batched jnp coefficient arrays
    (_equations below, kept as the oracle) emits thousands of tiny
    elementwise ops — profiled at ~22 ms per RANSAC checkpoint on TPU, the
    single largest cost of the iterative loop, and most of the 5-point
    path's compile time. Every coefficient of the 10x20 system is a cubic
    form in the basis entries, so the whole assembly collapses to
    gather-product-matmul: terms = B[I1]*B[I2]*B[I3] (unique cubic
    monomials), M = terms @ S with a static scatter matrix S.

    Returns (I1, I2, I3 [T] int arrays into the 37-vector [basis(36), 1],
    S [T, 200] float32: slot = eq * 20 + column over _LEFT+_RIGHT)."""
    import numpy as np_

    def lin(i, j):  # E[i][j]: degree-1 in (x,y,z), linear in basis entries
        return {(1, 0, 0): {(0 + i * 3 + j,): 1.0},
                (0, 1, 0): {(9 + i * 3 + j,): 1.0},
                (0, 0, 1): {(18 + i * 3 + j,): 1.0},
                (0, 0, 0): {(27 + i * 3 + j,): 1.0}}

    E = [[lin(i, j) for j in range(3)] for i in range(3)]

    def det3(M):
        t0 = _sym_pmul(M[0][0], _sym_padd(_sym_pmul(M[1][1], M[2][2]),
                                          _sym_pmul(M[1][2], M[2][1]), -1.0))
        t1 = _sym_pmul(M[0][1], _sym_padd(_sym_pmul(M[1][0], M[2][2]),
                                          _sym_pmul(M[1][2], M[2][0]), -1.0))
        t2 = _sym_pmul(M[0][2], _sym_padd(_sym_pmul(M[1][0], M[2][1]),
                                          _sym_pmul(M[1][1], M[2][0]), -1.0))
        return _sym_padd(_sym_padd(t0, t1, -1.0), t2)

    EEt = [[None] * 3 for _ in range(3)]
    for i in range(3):
        for j in range(3):
            acc: dict = {}
            for k in range(3):
                acc = _sym_padd(acc, _sym_pmul(E[i][k], E[j][k]))
            EEt[i][j] = acc
    trace = _sym_padd(_sym_padd(EEt[0][0], EEt[1][1]), EEt[2][2])

    eqs = [det3(E)]
    for i in range(3):
        for j in range(3):
            acc = {}
            for k in range(3):
                acc = _sym_padd(acc, _sym_pmul(EEt[i][k], E[k][j]))
            entry = _sym_padd(
                {m: {t: 2.0 * v for t, v in c.items()} for m, c in acc.items()},
                _sym_pmul(trace, E[i][j]), -1.0)
            eqs.append(entry)

    cols = _LEFT + _RIGHT
    term_index: dict = {}
    rows = []  # (term_id, slot, value)
    for eq_i, eq in enumerate(eqs):
        for ci, m in enumerate(cols):
            for t, v in eq.get(m, {}).items():
                tt = tuple(t) + (36,) * (3 - len(t))  # pad with the 1-symbol
                if tt not in term_index:
                    term_index[tt] = len(term_index)
                rows.append((term_index[tt], eq_i * 20 + ci, v))
    T = len(term_index)
    I = np_.zeros((3, T), np_.int32)
    for tt, ti in term_index.items():
        I[:, ti] = tt
    S = np_.zeros((T, 200), np_.float32)
    for ti, slot, v in rows:
        S[ti, slot] += v
    return I[0], I[1], I[2], S


def _equations(basis: jax.Array) -> list[dict]:
    """The 10 cubic equations as monomial dicts with batched coefficients
    (the readable oracle; production assembly uses _equation_table)."""
    X, Y, Z, W = (basis[..., i, :, :] for i in range(4))

    def lin(i, j):  # E[i][j] as a degree-1 polynomial
        return {(1, 0, 0): X[..., i, j], (0, 1, 0): Y[..., i, j],
                (0, 0, 1): Z[..., i, j], (0, 0, 0): W[..., i, j]}

    E = [[lin(i, j) for j in range(3)] for i in range(3)]

    def det3(M):
        t0 = _pmul(M[0][0], _padd(_pmul(M[1][1], M[2][2]),
                                  _pmul(M[1][2], M[2][1]), -1.0))
        t1 = _pmul(M[0][1], _padd(_pmul(M[1][0], M[2][2]),
                                  _pmul(M[1][2], M[2][0]), -1.0))
        t2 = _pmul(M[0][2], _padd(_pmul(M[1][0], M[2][1]),
                                  _pmul(M[1][1], M[2][0]), -1.0))
        return _padd(_padd(t0, t1, -1.0), t2)

    EEt = [[None] * 3 for _ in range(3)]
    for i in range(3):
        for j in range(3):
            acc: dict = {}
            for k in range(3):
                acc = _padd(acc, _pmul(E[i][k], E[j][k]))
            EEt[i][j] = acc
    trace = _padd(_padd(EEt[0][0], EEt[1][1]), EEt[2][2])

    eqs = [det3(E)]
    for i in range(3):
        for j in range(3):
            acc = {}
            for k in range(3):
                acc = _padd(acc, _pmul(EEt[i][k], E[k][j]))
            entry = _padd({m: 2.0 * c for m, c in acc.items()},
                          _pmul(trace, E[i][j]), -1.0)
            eqs.append(entry)
    return eqs


def _qr_solve_10(A: jax.Array, B: jax.Array) -> jax.Array:
    """Solve A X = B for [..., 10, 10] A and B via 10 static Householder
    reflections + back-substitution.

    Why: jnp.linalg.solve lowers to a batched pivoted LU whose sequential
    dynamic-pivot structure costs ~7 ms at [2048, 10, 10] on TPU (profiled);
    ten static rank-1 updates and a 10-step back-substitution are fused
    elementwise/matmul work at a fraction of that. No pivoting: a singular
    system yields inf/nan, which the caller's isfinite mask already treats
    as a degenerate sample — the same contract as the regularized LU."""
    dt = A.dtype
    n = 10
    G = jnp.concatenate([A, B], axis=-1)            # [..., 10, 20]
    rows = jnp.arange(n)
    for k in range(n):
        x = jnp.where(rows >= k, G[..., :, k], 0.0)            # [..., 10]
        nrm = jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True))
        xk = x[..., k:k + 1]
        sign = jnp.where(xk >= 0, 1.0, -1.0)
        v = x + sign * nrm * (rows == k).astype(dt)
        vn = jnp.sqrt(jnp.sum(v * v, axis=-1, keepdims=True))
        v = jnp.where(vn > 1e-30, v / jnp.maximum(vn, 1e-30), 0.0)
        G = G - 2.0 * v[..., :, None] * jnp.einsum(
            "...r,...rc->...c", v, G)[..., None, :]
    R = G[..., :, :n]
    C = G[..., :, n:]
    X = [None] * n
    for i in range(n - 1, -1, -1):
        acc = C[..., i, :]
        for j in range(i + 1, n):
            acc = acc - R[..., i, j:j + 1] * X[j]
        X[i] = acc / R[..., i, i:i + 1]
    return jnp.stack(X, axis=-2)                     # [..., 10, 10]


def _pconv(a: jax.Array, b: jax.Array) -> jax.Array:
    """1-D polynomial product on trailing coeff axes (ascending powers),
    static loops (sizes <= 11)."""
    da, db = a.shape[-1], b.shape[-1]
    out = [0.0] * (da + db - 1)
    for i in range(da):
        for j in range(db):
            out[i + j] = out[i + j] + a[..., i] * b[..., j]
    return jnp.stack(out, axis=-1)


def _polyval(c: jax.Array, z: jax.Array) -> jax.Array:
    """Horner on ascending coeffs; c [..., D], z [...]."""
    out = c[..., -1]
    for k in range(c.shape[-1] - 2, -1, -1):
        out = out * z + c[..., k]
    return out


@partial(jax.jit, static_argnames=("grid",))
def solve_essential_5pt(x0: jax.Array, x1: jax.Array, grid: int = 512):
    """x0, x1: [..., 5, 2] normalized image points. Returns
    (E [..., MAX_ROOTS, 3, 3], valid [..., MAX_ROOTS] bool)."""
    dt = jnp.float32
    x0 = x0.astype(dt)
    x1 = x1.astype(dt)
    basis = _null_basis(x0, x1)                    # [..., 4, 3, 3]
    batch = basis.shape[:-3]

    # assemble the 10x20 cubic system from the precomputed symbolic table:
    # gather-product-matmul instead of thousands of tiny coefficient ops
    I1, I2, I3, S = _equation_table()
    Bflat = jnp.concatenate(
        [basis.reshape(*batch, 36), jnp.ones(batch + (1,), dt)], axis=-1)
    terms = (jnp.take(Bflat, jnp.asarray(I1), axis=-1)
             * jnp.take(Bflat, jnp.asarray(I2), axis=-1)
             * jnp.take(Bflat, jnp.asarray(I3), axis=-1))       # [..., T]
    M20 = jnp.einsum("...t,ts->...s", terms, jnp.asarray(S, dt))
    M20 = M20.reshape(*batch, 10, 20)
    A = M20[..., :, :10]                            # [..., 10, 10] (_LEFT)
    Bm = M20[..., :, 10:]                           # [..., 10, 10] (_RIGHT)
    # singular systems (degenerate samples) yield non-finite C and are
    # masked invalid below; see _qr_solve_10 for why not jnp.linalg.solve
    C = _qr_solve_10(A, Bm)
    finite = jnp.all(jnp.isfinite(C), axis=(-1, -2))

    def zrow(u, v):
        """row u - z·row v over RIGHT monomials -> (px[4], py[4], p1[5])
        ascending z-power coeffs of x·px(z) + y·py(z) + p1(z)."""
        px = jnp.stack([u[..., 2], u[..., 1] - v[..., 2],
                        u[..., 0] - v[..., 1], -v[..., 0]], axis=-1)
        py = jnp.stack([u[..., 5], u[..., 4] - v[..., 5],
                        u[..., 3] - v[..., 4], -v[..., 3]], axis=-1)
        p1 = jnp.stack([u[..., 9], u[..., 8] - v[..., 9],
                        u[..., 7] - v[..., 8], u[..., 6] - v[..., 7],
                        -v[..., 6]], axis=-1)
        return px, py, p1

    rows = [zrow(C[..., 4, :], C[..., 5, :]),   # z·(x²) − (x²z)
            zrow(C[..., 6, :], C[..., 7, :]),   # z·(y²) − (y²z)
            zrow(C[..., 8, :], C[..., 9, :])]   # z·(xy) − (xyz)

    (px1, py1, p11), (px2, py2, p12), (px3, py3, p13) = rows
    # det of the 3x3 polynomial matrix -> degree-10 polynomial n(z)
    n = _pconv(px1, _padd_c(_pconv(py2, p13), _pconv(p12, py3), -1.0))
    n = n - _pconv(py1, _padd_c(_pconv(px2, p13), _pconv(p12, px3), -1.0))
    n = n + _pconv(p11, _padd_c(_pconv(px2, py3), _pconv(py2, px3), -1.0))
    # n: [..., 11] ascending powers

    # ---- real roots on the tangent-projective grid ------------------------
    eps = 1e-3
    thetas = jnp.linspace(-jnp.pi / 2 + eps, jnp.pi / 2 - eps, grid).astype(dt)
    sin_t, cos_t = jnp.sin(thetas), jnp.cos(thetas)
    # T[k, i] = sin^k(θᵢ) cos^(10−k)(θᵢ)  — g(θ) = Σ n_k T[k]
    T = jnp.stack([sin_t ** k * cos_t ** (10 - k) for k in range(11)])
    g = jnp.einsum("...k,ki->...i", n, T)          # [..., G]

    crossing = g[..., :-1] * g[..., 1:] < 0        # [..., G-1]
    score = jnp.where(crossing, 1.0, -1.0) * 1e6 - \
        jnp.arange(grid - 1, dtype=dt)
    _, slots = jax.lax.top_k(score, MAX_ROOTS)     # [..., R] interval ids
    has_root = jnp.take_along_axis(crossing, slots, axis=-1) & finite[..., None]

    lo = thetas[slots]
    hi = thetas[slots + 1]
    g_lo = jnp.take_along_axis(g, slots, axis=-1)

    def geval(theta):
        s, c = jnp.sin(theta), jnp.cos(theta)
        out = jnp.zeros_like(theta)
        for k in range(11):
            out = out + n[..., k, None] * s ** k * c ** (10 - k)
        return out

    def bisect(_, carry):
        lo, hi, g_lo = carry
        mid = 0.5 * (lo + hi)
        g_mid = geval(mid)
        left = g_lo * g_mid > 0
        return (jnp.where(left, mid, lo), jnp.where(left, hi, mid),
                jnp.where(left, g_mid, g_lo))

    # 28 halvings of a pi/(grid-1) interval reach ~2e-11 — far beyond fp32
    # resolution already (45 was pure latency-chain waste)
    lo, hi, _ = jax.lax.fori_loop(0, 28, bisect, (lo, hi, g_lo))
    z = jnp.tan(0.5 * (lo + hi))                   # [..., R]

    # ---- back-substitute (x, y) per root via 3x2 least squares -------------
    def pv(c):
        return _polyval(c[..., None, :], z)        # broadcast over roots

    M = jnp.stack([jnp.stack([pv(px1), pv(py1)], axis=-1),
                   jnp.stack([pv(px2), pv(py2)], axis=-1),
                   jnp.stack([pv(px3), pv(py3)], axis=-1)], axis=-2)  # [...,R,3,2]
    rhs = -jnp.stack([pv(p11), pv(p12), pv(p13)], axis=-1)            # [...,R,3]
    MtM = jnp.einsum("...ri,...rj->...ij", M, M)
    Mtb = jnp.einsum("...ri,...r->...i", M, rhs)
    # Cramer's rule on the regularized normal equations: jnp.linalg.solve on
    # [..., 2, 2] lowers to a batched pivoted LU profiled at ~14 ms per
    # RANSAC checkpoint on TPU; two fused multiply-adds cost ~nothing
    a = MtM[..., 0, 0] + 1e-12
    bb = MtM[..., 0, 1]
    cc = MtM[..., 1, 0]
    d = MtM[..., 1, 1] + 1e-12
    det = a * d - bb * cc
    e, f = Mtb[..., 0], Mtb[..., 1]
    xy = jnp.stack([(d * e - bb * f) / det,
                    (a * f - cc * e) / det], axis=-1)                 # [...,R,2]

    coef = jnp.concatenate([xy, z[..., None],
                            jnp.ones_like(z)[..., None]], axis=-1)    # x,y,z,1
    E = jnp.einsum("...rk,...kij->...rij", coef, basis)
    E = E / (jnp.linalg.norm(E, axis=(-2, -1), keepdims=True) + 1e-12)
    valid = has_root & jnp.all(jnp.isfinite(E), axis=(-1, -2))
    E = jnp.where(valid[..., None, None], E, jnp.eye(3, dtype=dt))
    # project onto the essential manifold: absorbs the fp32 residue of the
    # degree-10 root chain and guarantees a decomposable E for the cheirality
    # step (closed-form, no batched SVD — see eight_point.project_essential)
    from impx.ransac.eight_point import project_essential

    E = project_essential(E)
    E = E / (jnp.linalg.norm(E, axis=(-2, -1), keepdims=True) + 1e-12)
    # self-validation: every returned candidate must actually satisfy the 5
    # epipolar constraints it was solved from. An ill-conditioned (x, y)
    # back-substitution (the elimination's conditioning depends on the null-
    # basis orientation) can produce a root whose E is off by ~1e-1 — filter
    # those out here instead of relying on downstream RANSAC scoring.
    ones = jnp.ones(x0.shape[:-1] + (1,), dt)
    p0h = jnp.concatenate([x0, ones], axis=-1)   # [..., 5, 3]
    p1h = jnp.concatenate([x1, ones], axis=-1)
    resid = jnp.einsum("...ni,...rij,...nj->...rn", p1h, E, p0h)
    valid = valid & (jnp.max(jnp.abs(resid), axis=-1) < 1e-2)
    return E, valid


def _padd_c(a: jax.Array, b: jax.Array, sb: float = 1.0) -> jax.Array:
    """Add coefficient arrays of (possibly) different lengths."""
    la, lb = a.shape[-1], b.shape[-1]
    if la < lb:
        a = jnp.concatenate([a, jnp.zeros(a.shape[:-1] + (lb - la,), a.dtype)], -1)
    elif lb < la:
        b = jnp.concatenate([b, jnp.zeros(b.shape[:-1] + (la - lb,), b.dtype)], -1)
    return a + sb * b
