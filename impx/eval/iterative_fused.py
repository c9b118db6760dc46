"""Fully-fused batched iterative matching <-> pose loop: ONE jit program.

The host-driven loops (impx/eval/iterative.py) dispatch one program per layer
pair plus one per checkpoint and sync a scalar to early-exit — the right
trade when pairs converge early and dispatch is cheap. This variant is the
other point SURVEY §7 hard-part #4 prescribes: a fixed 15-iteration
lax.scan with per-pair convergence MASKS, everything (attention, fused
Sinkhorn, mutual-NN matches, vmapped on-device RANSAC, pose-diff stopping,
optional uncertainty pooling) inside one compiled program with ZERO host
round-trips. Converged pairs freeze their outputs mid-scan (identical
results to the host-driven batched loop run to completion); compute for them
is wasted, but on a remote-dispatch deployment (or any pipeline feeding
batches back-to-back) single-program throughput wins.

Checkpoint iterations, thresholds and stopping semantics mirror reference
eval/matching.py:16-123 (valid_its, min_kpts, pose diff <= 1.5 deg,
pose-inlier match output, p=0.2 fallback).

Once EVERY pair in the batch has converged, the remaining scan iterations
take an identity lax.cond branch — the early-stop FLOP savings of the
host-driven loop without any host sync, so trained-weight throughput scales
with the actual stopping iteration rather than the fixed 15.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from impx.eval.iterative import VALID_ITS, _pose_diff_deg
from impx.models.fast import _attn_block, _eimp_encode, stack_params
from impx.ops.attention import _interpret
from impx.ops.matching import matches_from_stats


@partial(jax.jit, static_argnames=(
    "model", "valid_its", "match_ratio", "min_kpts", "pose_stop_deg",
    "num_hypotheses", "sample_size", "ransac_bucket", "with_uncertainty",
    "mscore_base"))
def iterative_fused_batched(
    model,
    stacked: dict,
    data: dict,
    keys: jax.Array,          # [n_layers, 2] PRNG keys (one per iteration)
    norm_threshs: jax.Array,  # [B]
    valid_its: tuple = VALID_ITS,
    match_ratio: float = 0.1,
    min_kpts: int = 25,
    pose_stop_deg: float = 1.5,
    num_hypotheses: int = 256,
    sample_size: int = 5,
    ransac_bucket: int = 512,
    with_uncertainty: bool = False,
    mscore_base: float = 0.2,
):
    """data: standard batched feed + x0n/x1n [B, N, 2]. Returns per-pair
    state dict (indices0 [B,N], mscores0, R, t, has_pose, converged,
    stopped_at)."""
    from impx.ops.pallas.sinkhorn import sinkhorn_fused_stats
    from impx.ransac.pose_solver import (estimate_pose_from_matches,
                                         prior_essential)

    cfg = model.config
    assert cfg.norm_fn == "in"
    interpret = _interpret()
    compute_dtype = model.compute_dtype

    desc, keep0, keep1, zero_qk, b, n = _eimp_encode(model, stacked, data)
    x0n = data["x0n"].astype(jnp.float32)
    x1n = data["x1n"].astype(jnp.float32)

    do_check = jnp.asarray(
        [1.0 if ni in valid_its else 0.0 for ni in range(cfg.n_layers)])

    def swap(x):
        return jnp.concatenate([x[b:], x[:b]], axis=0)

    def check(operands):
        (per_it, desc, qk_self, qk_cross, keep0, keep1, state, key) = operands
        pl_ = {"final_proj": [{"w": per_it["final_w"], "b": per_it["final_b"]}],
               "bin_score": stacked["bin_score"]}
        d0, d1 = desc[:b].astype(jnp.float32), desc[b:].astype(jnp.float32)
        dist = model.compute_distance(pl_, d0, d1, layer_id=-1)
        stats = sinkhorn_fused_stats(
            dist, stacked["bin_score"], cfg.sinkhorn_iterations,
            keep0, keep1, interpret=interpret)
        idx0, _, ms0, _ = matches_from_stats(
            stats["max0"], stats["idx0"], stats["idx1"], match_ratio,
            keep0, keep1)

        m_valid = idx0 > -1
        n_matches = jnp.sum(m_valid, axis=1)
        pair_keys = jax.random.split(key, b)
        # match-compacted score-weighted RANSAC: only the matched pairs reach
        # the solver (bucket of ransac_bucket), minimal sets drawn
        # PROSAC-style by match score. The previous checkpoint's pose warm-
        # starts local optimization (prior_essential): consecutive checkpoint
        # poses then differ by at most one polish step whenever the prior
        # still explains the matches, instead of by independent-sample
        # jitter — the stop criterion (diff <= 1.5 deg, reference
        # matching.py:110-117) measures model agreement, not sampling luck.
        E_prev = jax.vmap(prior_essential)(state["R"], state["t"],
                                           state["has_pose"])
        pose = jax.vmap(
            lambda k, a, bb, i0, ms, th, ei: estimate_pose_from_matches(
                k, a, bb, i0, ms, th, bucket=ransac_bucket,
                num_hypotheses=num_hypotheses, sample_size=sample_size,
                E_init=ei)
        )(pair_keys, x0n, x1n, idx0, ms0, norm_threshs, E_prev)

        enough = n_matches >= min_kpts
        pose_ok = pose["num_inliers"] >= 5
        diff = jax.vmap(_pose_diff_deg)(state["R"], state["t"],
                                        pose["R"], pose["t"])
        diff = jnp.where(state["has_pose"] & pose_ok & enough, diff, jnp.inf)
        newly = enough & (diff <= pose_stop_deg) & ~state["converged"]
        active = ~state["converged"]
        inlier_idx0 = jnp.where(m_valid & pose["inliers"], idx0, -1)

        upd = active & enough & pose_ok
        state = dict(state)
        state["R"] = jnp.where(upd[:, None, None], pose["R"], state["R"])
        state["t"] = jnp.where(upd[:, None], pose["t"], state["t"])
        state["has_pose"] = jnp.where(active, enough & pose_ok,
                                      state["has_pose"])
        state["indices0"] = jnp.where(
            newly[:, None], inlier_idx0,
            jnp.where(active[:, None], idx0, state["indices0"]))
        state["mscores0"] = jnp.where(active[:, None], ms0, state["mscores0"])
        state["stopped_at"] = jnp.where(newly, state["it"] + 1,
                                        state["stopped_at"])
        state["converged"] = state["converged"] | newly

        if with_uncertainty:
            # pose-uncertainty-scaled pooling (reference matching.py:243-257),
            # attention masses from the carried q/k via the mass kernel — the
            # same statistics as the EIMP scan body (impx/models/fast.py)
            from impx.ops.pallas.attention import attention_key_mass

            ir = jnp.where(n_matches > 0,
                           pose["num_inliers"] / jnp.maximum(n_matches, 1), 0.0)
            th = jnp.where(ir > 0, mscore_base * ir, mscore_base)[:, None]
            keep = jnp.concatenate([keep0, keep1], axis=0)
            keep_swap = jnp.concatenate([keep1, keep0], axis=0)
            m_self = attention_key_mass(qk_self["q"], qk_self["k"],
                                        keep, keep, interpret=interpret)
            m_cross = attention_key_mass(qk_cross["q"], qk_cross["k"],
                                         keep_swap, keep, interpret=interpret)
            norm = lambda m: m / (jnp.sum(m, axis=1, keepdims=True) + 1e-15)
            n00, n11 = norm(m_self[:b]), norm(m_self[b:])
            n10, n01 = norm(m_cross[:b]), norm(m_cross[b:])
            new0, new1 = model._pool_from_masses(
                stats["rowmass"], stats["colmass"], n00, n01, n11, n10,
                keep0, keep1, th, cfg.n_min_tokens)
            keep0 = jnp.where(active[:, None], new0, keep0)
            keep1 = jnp.where(active[:, None], new1, keep1)
        return state, keep0, keep1

    def run_iteration(carry, per_it):
        desc, qk_self, qk_cross, keep0, keep1, state = carry
        keep = jnp.concatenate([keep0, keep1], axis=0)
        keep_swap = jnp.concatenate([keep1, keep0], axis=0)
        delta, qk_self = _attn_block(
            per_it["self"], desc, desc, qk_self, keep, keep,
            cfg.num_heads, cfg.ac_fn, compute_dtype, interpret)
        desc = desc + delta
        delta, qk_cross = _attn_block(
            per_it["cross"], desc, swap(desc), qk_cross, keep_swap, keep,
            cfg.num_heads, cfg.ac_fn, compute_dtype, interpret)
        desc = desc + delta

        state, keep0, keep1 = jax.lax.cond(
            per_it["do_check"] > 0.5,
            check,
            lambda op: (op[6], op[4], op[5]),
            (per_it, desc, qk_self, qk_cross, keep0, keep1, state,
             per_it["key"]))
        return (desc, qk_self, qk_cross, keep0, keep1, state)

    def body(carry, per_it):
        # device-side early exit: once EVERY pair has converged, remaining
        # iterations take the identity branch — the early-stop FLOP savings
        # of the host-driven loop (reference matching.py:110-117) with zero
        # host syncs. (lax.cond executes only the taken branch under jit.)
        state = carry[-1]
        carry = jax.lax.cond(jnp.all(state["converged"]),
                             lambda c: c,
                             lambda c: run_iteration(c, per_it),
                             carry)
        desc, qk_self, qk_cross, keep0, keep1, state = carry
        state = dict(state, it=state["it"] + 1)
        return (desc, qk_self, qk_cross, keep0, keep1, state), None

    state0 = {
        "R": jnp.broadcast_to(jnp.eye(3), (b, 3, 3)),
        "t": jnp.zeros((b, 3)),
        "has_pose": jnp.zeros((b,), bool),
        "converged": jnp.zeros((b,), bool),
        "indices0": jnp.full((b, n), -1, jnp.int32),
        "mscores0": jnp.zeros((b, n), jnp.float32),
        "stopped_at": jnp.full((b,), cfg.n_layers, jnp.int32),
        "it": jnp.zeros((), jnp.int32),
    }
    per_it = {
        "self": stacked["self"], "cross": stacked["cross"],
        "final_w": stacked["final_w"], "final_b": stacked["final_b"],
        "do_check": do_check, "key": keys,
    }
    (_, _, _, keep0, keep1, state), _ = jax.lax.scan(
        body, (desc, zero_qk, zero_qk, keep0, keep1, state0), per_it)
    state.pop("it")
    return state


def run_iterative_fused(model, params, data, key, norm_threshs, **kw):
    """Convenience wrapper: stacks params and fans the key out per layer."""
    stacked = stack_params(params, model.config)
    keys = jax.random.split(key, model.config.n_layers)
    return iterative_fused_batched(model, stacked, data, keys,
                                   jnp.asarray(norm_threshs, jnp.float32), **kw)
