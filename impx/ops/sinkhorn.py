"""Optimal-transport score heads: Sinkhorn (with learned dustbin) and dual-softmax.

`sink_algorithm` reproduces the reference's non-log Sinkhorn exactly
(reference nets/layers.py:27-46: initial row softmax, then u/v marginal
iterations with eps=1e-8, dustbin marginal = N+1), generalized to fixed-shape
padded inputs with validity masks: padded rows/cols get zero marginals and
-inf scores, which makes the padded iteration *identical* (not approximately)
to running the reference on the compacted keypoint sets. That is the core
trick that lets the whole matcher run with static shapes on TPU.

`log_optimal_transport` is the numerically stable log-domain variant
(reference nets/superglue.py:180-209), exposed for the SuperGlue baseline and
as the preferred head for bf16 training.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

EPS = 1e-8  # reference nets/layers.py:13
_NEG = -1e30


def _pad_with_dustbin(dist: jax.Array, dustbin: jax.Array) -> jax.Array:
    """Append dustbin column and row filled with the learned bin score."""
    b, n, m = dist.shape
    bin_ = jnp.broadcast_to(dustbin.astype(dist.dtype), (b, n, 1))
    dist = jnp.concatenate([dist, bin_], axis=-1)
    bin_row = jnp.broadcast_to(dustbin.astype(dist.dtype), (b, 1, m + 1))
    return jnp.concatenate([dist, bin_row], axis=-2)


def _padded_masks(b, n, m, valid0, valid1, dtype):
    if valid0 is None:
        valid0 = jnp.ones((b, n), bool)
    if valid1 is None:
        valid1 = jnp.ones((b, m), bool)
    one = jnp.ones((b, 1), bool)
    v0p = jnp.concatenate([valid0, one], axis=1)  # dustbin row always valid
    v1p = jnp.concatenate([valid1, one], axis=1)
    return valid0.astype(dtype), valid1.astype(dtype), v0p, v1p


def sink_algorithm(
    dist: jax.Array,
    dustbin: jax.Array,
    iterations: int,
    valid0: jax.Array | None = None,
    valid1: jax.Array | None = None,
    plan_dtype=None,
) -> jax.Array:
    """Non-log Sinkhorn with dustbin, masked. Returns [B, N+1, M+1] transport plan.

    Marginals: each valid keypoint 1, dustbin = (#valid on the other side) + 1
    (reference layers.py:41-44 uses the padded size). Padded entries get zero
    mass exactly.

    plan_dtype: storage dtype of the (fixed) initial plan inside the u/v
    iteration — the loop is HBM-bound on re-reading it, so bf16 halves the
    Sinkhorn cost; u/v stay fp32 and the returned plan is fp32.
    """
    b, n, m = dist.shape
    f0, f1, v0p, v1p = _padded_masks(b, n, m, valid0, valid1, dist.dtype)
    n0 = jnp.sum(f0, axis=1, keepdims=True)  # [B,1] actual counts
    n1 = jnp.sum(f1, axis=1, keepdims=True)

    M = _pad_with_dustbin(dist, dustbin)
    M = jnp.where(v0p[:, :, None] & v1p[:, None, :], M, _NEG)

    # dustbin marginals: reference layers.py:41-44 uses the padded ROW count
    # for the dustbin row and the padded COL count for the dustbin col
    r = jnp.concatenate([f0, n0 + 1.0], axis=1)  # [B, N+1]
    c = jnp.concatenate([f1, n1 + 1.0], axis=1)  # [B, M+1]

    p = jax.nn.softmax(M, axis=-1)
    # plan_dtype canonicalized to a hashable string ("None" = keep fp32)
    pd = "None" if plan_dtype is None else jnp.dtype(plan_dtype).name
    return _sinkhorn_uv(p, r, c, iterations, pd)


def _mv(p_loop, v):
    """p @ v rows-contraction at the plan's storage dtype, fp32 accumulate."""
    return jnp.einsum("bnm,bm->bn", p_loop, v.astype(p_loop.dtype),
                      preferred_element_type=jnp.float32)


def _mtv(p_loop, u):
    return jnp.einsum("bnm,bn->bm", p_loop, u.astype(p_loop.dtype),
                      preferred_element_type=jnp.float32)


def _uv_iterate(p, r, c, iterations, plan_dtype):
    p_loop = p.astype(plan_dtype) if plan_dtype != "None" else p

    def body(_, uv):
        u, v = uv
        u = r / (_mv(p_loop, v) + EPS)
        v = c / (_mtv(p_loop, u) + EPS)
        return u, v

    return jax.lax.fori_loop(0, iterations, body,
                             (jnp.ones_like(r), jnp.ones_like(c)))


import functools as _functools


@_functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _sinkhorn_uv(p, r, c, iterations, plan_dtype):
    """u/v marginal iteration + final scaling P = p * u v^T, with a
    restructured reverse pass.

    Plain AD through the loop accumulates a full [B,N+1,M+1] plan-gradient
    contribution on EVERY sweep (two einsum-VJP read-modify-writes per
    iteration — ~6x plan-size HBM traffic per sweep, the training-step
    bottleneck at 20 sweeps x 15 supervised iterations). This VJP is the
    same unrolled-loop gradient the reference backprops
    (nets/layers.py:27-46 under autograd), restructured: the forward residual
    is only the tiny per-sweep u/v vectors, the reverse recurrence runs on
    vectors (two matvecs per sweep), and all 2T rank-1 plan-gradient terms
    are materialized in ONE stacked [N+1,2T]x[2T,M+1] matmul."""
    u, v = _uv_iterate(p, r, c, iterations, plan_dtype)
    return p * u[:, :, None] * v[:, None, :]


def _sinkhorn_uv_fwd(p, r, c, iterations, plan_dtype):
    p_loop = p.astype(plan_dtype) if plan_dtype != "None" else p

    def body(uv, _):
        u, v = uv
        su = _mv(p_loop, v) + EPS
        u = r / su
        sv = _mtv(p_loop, u) + EPS
        v = c / sv
        return (u, v), (su, sv, u, v)

    (u, v), hist = jax.lax.scan(
        body, (jnp.ones_like(r), jnp.ones_like(c)), None, length=iterations)
    out = p * u[:, :, None] * v[:, None, :]
    return out, (p, r, c, hist)


def _sinkhorn_uv_bwd(iterations, plan_dtype, res, g):
    p, r, c, hist = res
    sus, svs, us, vs = hist  # each [T, B, N+1] / [T, B, M+1]
    p_loop = p.astype(plan_dtype) if plan_dtype != "None" else p
    u_T, v_T = us[-1], vs[-1]

    gp = g * p
    u_bar0 = jnp.einsum("bnm,bm->bn", gp, v_T)   # output -> u_T
    v_bar0 = jnp.einsum("bnm,bn->bm", gp, u_T)   # output -> v_T
    v_prevs = jnp.concatenate([jnp.ones_like(vs[:1]), vs[:-1]], axis=0)

    def rbody(carry, xs):
        u_bar, v_bar = carry        # grads wrt u_t, v_t entering step t
        su, sv, u_t, v_prev = xs
        sv_bar = -(v_bar * c) / (sv * sv)            # v_t = c / sv
        u_tot = u_bar + _mv(p_loop, sv_bar)          # u_t used in sv
        su_bar = -(u_tot * r) / (su * su)            # u_t = r / su
        v_prev_bar = _mtv(p_loop, su_bar)            # v_{t-1} used in su
        r_bar = u_tot / su
        c_bar = v_bar / sv
        return (jnp.zeros_like(u_bar), v_prev_bar), \
            (u_t, sv_bar, su_bar, v_prev, r_bar, c_bar)

    _, outs = jax.lax.scan(rbody, (u_bar0, v_bar0),
                           (sus, svs, us, v_prevs), reverse=True)
    u_ts, sv_bars, su_bars, v_prevs_o, r_bars, c_bars = outs

    # all 2T rank-1 plan-gradient terms in one matmul, plus the output term
    A = jnp.concatenate([u_ts, su_bars], axis=0)        # [2T, B, N+1]
    Bm = jnp.concatenate([sv_bars, v_prevs_o], axis=0)  # [2T, B, M+1]
    p_bar = g * (u_T[:, :, None] * v_T[:, None, :])
    p_bar = p_bar + jnp.einsum("tbn,tbm->bnm", A, Bm,
                               preferred_element_type=jnp.float32)
    return p_bar, jnp.sum(r_bars, axis=0), jnp.sum(c_bars, axis=0)


_sinkhorn_uv.defvjp(_sinkhorn_uv_fwd, _sinkhorn_uv_bwd)


def dual_softmax(
    dist: jax.Array,
    dustbin: jax.Array,
    valid0: jax.Array | None = None,
    valid1: jax.Array | None = None,
) -> jax.Array:
    """exp(log_softmax(rows) + log_softmax(cols)) on the dustbin-padded matrix
    (reference nets/layers.py:20-24), masked."""
    b, n, m = dist.shape
    _, _, v0p, v1p = _padded_masks(b, n, m, valid0, valid1, dist.dtype)
    ok = v0p[:, :, None] & v1p[:, None, :]
    M = _pad_with_dustbin(dist, dustbin)
    M = jnp.where(ok, M, _NEG)
    score = jax.nn.log_softmax(M, axis=-1) + jax.nn.log_softmax(M, axis=-2)
    # fully-masked rows x cols softmax to uniform garbage at pad-pad cells;
    # zero them so padded entries carry exactly no mass
    return jnp.where(ok, jnp.exp(score), 0.0)


def log_optimal_transport(
    dist: jax.Array,
    dustbin: jax.Array,
    iterations: int,
    valid0: jax.Array | None = None,
    valid1: jax.Array | None = None,
) -> jax.Array:
    """Log-domain Sinkhorn (reference nets/superglue.py:189-209), masked.

    Returns log-assignment [B, N+1, M+1] with the same normalization as the
    reference: scores are shifted by -log(N+M) ("norm") and the result is the
    log transport plan Z + u + v - norm... exactly as superglue returns
    (Z = Z - norm at the end).
    """
    b, n, m = dist.shape
    f0, f1, v0p, v1p = _padded_masks(b, n, m, valid0, valid1, dist.dtype)
    n0 = jnp.sum(f0, axis=1, keepdims=True)
    n1 = jnp.sum(f1, axis=1, keepdims=True)

    Z = _pad_with_dustbin(dist, dustbin)
    Z = jnp.where(v0p[:, :, None] & v1p[:, None, :], Z, _NEG)

    norm = -jnp.log(n0 + n1)  # [B,1]
    log_mu = jnp.concatenate([norm * f0 + _NEG * (1 - f0), jnp.log(n1) + norm], axis=1)
    log_nu = jnp.concatenate([norm * f1 + _NEG * (1 - f1), jnp.log(n0) + norm], axis=1)

    return _log_uv(Z, log_mu, log_nu, iterations) - norm[:, :, None]


@_functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _log_uv(Z, log_mu, log_nu, iterations):
    """Log-domain u/v iteration + output Z + u + v, with the same
    restructured reverse pass as _sinkhorn_uv.

    Key identity: the row-softmax weights of sweep t factor through the
    FIXED matrix E = exp(Z - rowmax):
        w_t[n,m] = exp(Z[n,m] + v_{t-1}[m] - lse_t[n])
                 = E[n,m] * exp(s[n] + u_t[n] - log_mu[n]) * exp(v_{t-1}[m])
    (and analogously for the column sweeps), so every sweep's plan-gradient
    contribution is rank-1 in the E-basis: the reverse recurrence runs on
    vectors with two E-matvecs per sweep, and Z_bar materializes once as
    g + E * (stacked [N+1,2T]x[2T,M+1] matmul) instead of one full-plan
    softmax-VJP accumulation per sweep (what plain AD — and the reference's
    autograd through superglue.py:180-186 — does)."""
    u, v = _log_uv_iterate(Z, log_mu, log_nu, iterations)
    return Z + u[:, :, None] + v[:, None, :]


def _log_uv_iterate(Z, log_mu, log_nu, iterations):
    def body(_, uv):
        u, v = uv
        u = log_mu - jax.nn.logsumexp(Z + v[:, None, :], axis=2)
        v = log_nu - jax.nn.logsumexp(Z + u[:, :, None], axis=1)
        return u, v

    return jax.lax.fori_loop(
        0, iterations, body, (jnp.zeros_like(log_mu), jnp.zeros_like(log_nu)))


def _log_uv_fwd(Z, log_mu, log_nu, iterations):
    def body(uv, _):
        u, v = uv
        u = log_mu - jax.nn.logsumexp(Z + v[:, None, :], axis=2)
        v = log_nu - jax.nn.logsumexp(Z + u[:, :, None], axis=1)
        return (u, v), (u, v)

    (u, v), hist = jax.lax.scan(
        body, (jnp.zeros_like(log_mu), jnp.zeros_like(log_nu)),
        None, length=iterations)
    return Z + u[:, :, None] + v[:, None, :], (Z, log_mu, log_nu, hist)


def _log_uv_bwd(iterations, res, g):
    Z, log_mu, log_nu, hist = res
    us, vs = hist  # [T, B, N+1] / [T, B, M+1]
    u_T, v_T = us[-1], vs[-1]
    row_ok = log_mu > _NEG / 2   # [B, N+1]
    col_ok = log_nu > _NEG / 2   # [B, M+1]
    ok = row_ok[:, :, None] & col_ok[:, None, :]

    s = jnp.max(jnp.where(ok, Z, _NEG), axis=2)             # [B, N+1] row shift
    E = jnp.where(ok, jnp.exp(Z - s[:, :, None]), 0.0)      # in [0, 1]

    # output O = Z + u_T + v_T
    u_bar0 = jnp.sum(g, axis=2)
    v_bar0 = jnp.sum(g, axis=1)
    v_prevs = jnp.concatenate([jnp.zeros_like(vs[:1]), vs[:-1]], axis=0)

    # sanitized per-sweep scale vectors (pad rows/cols never contribute:
    # their weights are exactly zero in plain AD too)
    zr = jnp.zeros_like(log_mu)
    zc = jnp.zeros_like(log_nu)

    def rbody(carry, xs):
        u_bar, v_bar = carry          # grads wrt u_t, v_t entering step t
        u_t, v_t, v_prev = xs
        # v_t = log_nu - LSE_n(Z + u_t); w'[n,m] = E a_t[n] d_t[m]
        a_t = jnp.where(row_ok, jnp.exp(s + u_t), zr)
        d_t = jnp.where(col_ok, jnp.exp(v_t - log_nu), zc)
        vd = v_bar * d_t
        u_tot = u_bar - a_t * jnp.einsum(
            "bnm,bm->bn", E, vd, preferred_element_type=jnp.float32)
        # u_t = log_mu - LSE_m(Z + v_{t-1}); w[n,m] = E alpha_t[n] e^{v_prev[m]}
        alpha_t = jnp.where(row_ok, jnp.exp(s + u_t - log_mu), zr)
        ua = u_tot * alpha_t
        ev_prev = jnp.where(col_ok, jnp.exp(v_prev), zc)
        v_prev_bar = -ev_prev * jnp.einsum(
            "bnm,bn->bm", E, ua, preferred_element_type=jnp.float32)
        # rank-1 Z-gradient factors: (-a_t) x vd  and  (-ua) x ev_prev
        return (jnp.zeros_like(u_bar), v_prev_bar), \
            (a_t, vd, ua, ev_prev, u_tot, v_bar)

    _, outs = jax.lax.scan(rbody, (u_bar0, v_bar0), (us, vs, v_prevs),
                           reverse=True)
    a_ts, vds, uas, ev_prevs, u_tots, v_bars = outs

    A = jnp.concatenate([-a_ts, -uas], axis=0)         # [2T, B, N+1]
    Bm = jnp.concatenate([vds, ev_prevs], axis=0)      # [2T, B, M+1]
    Z_bar = g + E * jnp.einsum("tbn,tbm->bnm", A, Bm,
                               preferred_element_type=jnp.float32)
    # log_mu/log_nu appear only inside the sweeps (u_t = log_mu - lse, v_t =
    # log_nu - lse'): their grads are the summed per-sweep totals — the
    # output's u_T/v_T terms entered the t=T carry and are already counted
    return Z_bar, jnp.sum(u_tots, axis=0), jnp.sum(v_bars, axis=0)


_log_uv.defvjp(_log_uv_fwd, _log_uv_bwd)
