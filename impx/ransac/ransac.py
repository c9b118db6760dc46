"""Batched on-device RANSAC for the essential matrix.

TPU-native replacement for cv2.findEssentialMat(USAC_MAGSAC) — the host C++
call the reference makes *inside* its iterative matching loop
(eval/matching.py:84-87), forcing a device->host round-trip per iteration.
Here the whole hypothesize-and-verify pipeline is fixed-shape jnp:

  1. sample H minimal subsets at once — uniform via random draws into a
     dense valid-index table (rare within-sample collisions just score low),
     or PROSAC-style weighted via Gumbel top-k when confidences are given;
  2. solve all hypotheses with the batched 8-point solver (Cholesky inverse
     iteration — no eigh) or the Nistér 5-point minimal solver;
  3. score all hypotheses against all points in one [H, N] Sampson-distance
     matrix with a MAGSAC-style truncated-quadratic gain;
  4. local optimization: iteratively reweighted least squares on the best
     model's inliers (fixed iteration count, lax.fori_loop).

Everything jits; vmap over pairs gives batched multi-pair RANSAC for free.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from impx.geometry.epipolar import sampson_distance
from impx.ransac.eight_point import essential_from_points


def _sample_minimal_sets(key, valid, num_hypotheses: int, sample_size: int):
    """[H, sample_size] indices of valid points, ~uniform.

    One argsort builds a dense valid-index table, then H*S random draws index
    into it — vs Gumbel top-k, which sorts an [H, N] matrix per call (a real
    cost inside the iterative loop's checkpoints). Within-sample collisions
    (~1% at N≈2k) just produce degenerate hypotheses that score low."""
    order = jnp.argsort(~valid)  # valid indices first, stable
    nv = jnp.maximum(jnp.sum(valid), 1)
    r = jax.random.randint(key, (num_hypotheses, sample_size), 0, nv)
    return order[r]


def _sample_minimal_sets_weighted(key, weights, valid, num_hypotheses: int,
                                  sample_size: int):
    """[H, sample_size] indices, drawn WITHOUT replacement per hypothesis with
    probability proportional to `weights` (Gumbel top-k). The PROSAC idea
    behind cv2 USAC (reference pose_estimation.py:96-105 uses USAC_MAGSAC):
    high-confidence matches are likelier inliers, so confidence-weighted
    minimal sets reach a good hypothesis with far fewer samples than uniform
    sampling. Cost is a [H, N] top-k — run it on match-compacted points
    (N <= a few hundred), not raw keypoint sets."""
    logw = jnp.where(valid & (weights > 0),
                     jnp.log(jnp.maximum(weights, 1e-20)), -jnp.inf)
    g = jax.random.gumbel(key, (num_hypotheses, weights.shape[-1]),
                          dtype=jnp.float32)
    _, idx = jax.lax.top_k(logw[None, :] + g, sample_size)
    return idx


def _score(E, x0, x1, valid, threshold, sigmas=(1.0,)):
    """Truncated-quadratic gain + inlier mask for one model. With several
    `sigmas`, the gain marginalizes the truncation scale (the cheap form of
    MAGSAC's sigma-consensus: a hypothesis whose residuals sit just beyond
    one threshold still collects credit at the wider ones, so model selection
    stops knife-edging on noise ~ threshold). The inlier MASK stays at the
    base threshold."""
    d2 = sampson_distance(x0, x1, E)
    t2 = threshold * threshold
    inlier = (d2 < t2) & valid
    gain = sum(
        jnp.sum(jnp.where(valid,
                          jnp.maximum(0.0, 1.0 - d2 / (t2 * s * s)), 0.0),
                axis=-1) / s
        for s in sigmas)
    return gain, inlier, d2


@partial(jax.jit, static_argnames=("num_hypotheses", "sample_size",
                                   "lo_iterations", "score_sigmas",
                                   "lo_anneal", "lo_starts"))
def estimate_essential_ransac(
    key: jax.Array,
    x0: jax.Array,
    x1: jax.Array,
    valid: jax.Array,
    threshold: float,
    num_hypotheses: int = 1024,
    sample_size: int = 8,
    lo_iterations: int = 4,
    weights: jax.Array | None = None,
    score_sigmas: tuple = (1.0, 2.0),
    lo_anneal: float = 3.0,
    lo_starts: int = 1,
    E_init: jax.Array | None = None,
):
    """x0, x1: [N, 2] normalized camera coordinates; valid: [N] bool;
    threshold: inlier threshold in normalized coordinates (Sampson).

    sample_size=5 uses the batched Nistér minimal solver (up to 10 candidate
    E per sample, all scored — matching cv2 USAC's 5-point hypotheses,
    reference eval/pose_estimation.py:96-105); sample_size>=8 uses the
    batched 8-point solver.

    weights: optional [N] sampling confidences (e.g. match scores) —
    minimal sets are then drawn PROSAC-style proportional to weight, which
    preserves accuracy at a fraction of the hypothesis budget.

    E_init: optional [3,3] warm-start model (e.g. the previous checkpoint's
    essential matrix in the iterative loop). It joins the local-optimization
    starts and competes under the SAME gain as every sampled hypothesis, so
    it can only win when it genuinely explains the current matches — a stale
    or wrong prior loses to fresh hypotheses. Callers must pass a FINITE,
    nonzero matrix (gate with e.g. skew([0,0,1]) when no prior exists);
    Sampson scoring is scale-invariant in E, so no normalization is needed.

    Returns dict(E [3,3], inliers [N] bool, gain scalar, num_inliers).
    """
    if weights is not None:
        idx = _sample_minimal_sets_weighted(
            key, weights, valid, num_hypotheses, sample_size)  # [H, S]
    else:
        idx = _sample_minimal_sets(key, valid, num_hypotheses, sample_size)
    sx0 = x0[idx]  # [H, S, 2]
    sx1 = x1[idx]
    if sample_size == 5:
        from impx.ransac.five_point import solve_essential_5pt

        Es, ok = solve_essential_5pt(sx0, sx1)      # [H, R, 3, 3], [H, R]
        Es = Es.reshape(-1, 3, 3)
        gains, _, _ = jax.vmap(
            lambda E: _score(E, x0, x1, valid, threshold, score_sigmas))(Es)
        gains = jnp.where(ok.reshape(-1), gains, -jnp.inf)
    else:
        # project=False: scoring tolerates near-essential candidates, and the
        # per-hypothesis polar/eigen projection would dominate the checkpoint
        # cost at H hypotheses; the winner is refined (and projected) by the
        # IRLS loop below
        Es = essential_from_points(sx0, sx1, project=False)  # [H, 3, 3]
        gains, _, _ = jax.vmap(
            lambda E: _score(E, x0, x1, valid, threshold, score_sigmas))(Es)
    # local optimization: IRLS with truncated weights and an ANNEALED support
    # threshold (LO-RANSAC, Chum et al.): start the refit from a wide basin
    # (lo_anneal * threshold recovers true inliers the minimal-set model left
    # just outside the base threshold) and shrink to the base threshold by the
    # last iteration. Acceptance is always judged at the BASE threshold.
    # MULTI-START: cv2 USAC runs LO at every so-far-best hypothesis; the
    # vectorized equivalent is LO from each of the top-`lo_starts` hypotheses
    # (distinct basins) keeping the best final gain.
    def lo_body(i, carry):
        E, g = carry
        frac = (lo_iterations - 1.0 - i) / max(lo_iterations - 1.0, 1.0)
        m2 = (1.0 + (lo_anneal - 1.0) * frac) ** 2
        d2 = sampson_distance(x0, x1, E)
        t2 = threshold * threshold
        w = jnp.where((d2 < t2 * m2) & valid, 1.0 / (1.0 + d2 / (t2 * m2)), 0.0)
        n_in = jnp.sum(w > 0)
        E_new = essential_from_points(x0, x1, weights=w)
        g_new, _, _ = _score(E_new, x0, x1, valid, threshold, score_sigmas)
        better = (g_new >= g) & (n_in >= 8)  # keep refit only if gain held
        return jnp.where(better, E_new, E), jnp.where(better, g_new, g)

    def lo_chain(E0):
        g0, _, _ = _score(E0, x0, x1, valid, threshold, score_sigmas)
        return jax.lax.fori_loop(0, lo_iterations, lo_body, (E0, g0))

    top_g, top_i = jax.lax.top_k(gains, min(lo_starts, gains.shape[0]))
    starts = Es[top_i]
    if E_init is not None:
        # the warm-start model is one more LO basin (cv2 USAC seeds LO from
        # every so-far-best model; the previous checkpoint's pose is exactly
        # such a model for the iterative protocol)
        starts = jnp.concatenate([starts, E_init[None]], axis=0)
    Es_f, gs_f = jax.vmap(lo_chain)(starts)
    b = jnp.argmax(gs_f)
    E = Es_f[b]
    gain, inliers, _ = _score(E, x0, x1, valid, threshold, score_sigmas)
    return {
        "E": E,
        "inliers": inliers,
        "gain": gain,
        "num_inliers": jnp.sum(inliers),
    }
