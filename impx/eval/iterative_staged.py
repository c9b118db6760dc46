"""Iterative matching <-> pose loop with STAGED COMPACTION: checkpoint-depth
cohorts, lockstep within a cohort, shared (static) weights everywhere.

Why a third scheduling point. The lockstep loop (iterative_fused.py) wastes
the FLOPs of early-converged pairs until the batch straggler finishes; the
slot-refill loop (iterative_refill.py) fixes that but pays for it structurally
— every slot sits at its own depth, so every projection/merge/MLP matmul runs
with a per-slot GATHERED weight operand and the Sinkhorn+RANSAC checkpoint
stage fires on (nearly) every step. Measured, the gathers ate the savings
(42.8 pairs/s vs lockstep's 48.4 at matched shapes).

This variant restructures the schedule around the checkpoint grid itself
(reference eval/matching.py:43 valid_its = iterations 3,5,7,9,11,13,14): a
STAGE s is the segment of layers between two consecutive checkpoints. All
pairs inside a batch are at the SAME stage, so the segment's layer weights
are trace-time constants (no gathers, full lockstep MXU efficiency) and the
checkpoint fires exactly once per segment. When the checkpoint converges a
pair (pose diff <= 1.5 deg, reference matching.py:110-117), the pair leaves
the schedule; survivors are re-batched from a device-resident buffer with
whatever other pairs reached the same depth — one `lax.while_loop` whose body
gathers the fullest cohort, `lax.switch`es into its segment, and scatters the
results back. Zero host round-trips, static shapes throughout.

Scheduling invariance: a pair's checkpoint RNG key is derived from its
IDENTITY only (fold_in(key, pair_ids[qidx]); pair_ids defaults to the queue
position), never from the slot, step, or cohort composition. Queue-order
invariance is bitwise (same shapes, same program) and pinned by
tests/test_iterative_e2e.py; across different cohort SIZES the program
changes, so agreement is up to fp rounding at the pose-stop threshold.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from impx.eval.iterative import VALID_ITS, _pose_diff_deg
from impx.models.fast import _attn_block, stack_params
from impx.ops.attention import _interpret
from impx.ops.matching import matches_from_stats


def _segments(n_layers: int, valid_its: tuple):
    """Split layers 0..n_layers-1 into checkpoint-bounded segments.
    Returns a list of (layer_indices, checkpoint_layer_or_None)."""
    bounds = sorted(i for i in valid_its if i < n_layers)
    segs = []
    start = 0
    for b in bounds:
        segs.append((tuple(range(start, b + 1)), b))
        start = b + 1
    if start < n_layers:  # trailing layers with no checkpoint after them
        segs.append((tuple(range(start, n_layers)), None))
    return segs


@partial(jax.jit, static_argnames=(
    "model", "batch", "valid_its", "match_ratio", "min_kpts", "pose_stop_deg",
    "num_hypotheses", "sample_size", "ransac_bucket"))
def iterative_staged_queue(
    model,
    stacked: dict,
    queue: dict,
    key: jax.Array,
    batch: int = 8,
    valid_its: tuple = VALID_ITS,
    match_ratio: float = 0.1,
    min_kpts: int = 25,
    pose_stop_deg: float = 1.5,
    num_hypotheses: int = 256,
    sample_size: int = 5,
    ransac_bucket: int = 512,
):
    """Drain a device-resident queue of Q pairs through depth-aligned cohorts
    of `batch` pairs.

    queue: dict of per-pair arrays — descriptors0/1 [Q,N,D],
    norm_keypoints0/1 [Q,N,2], scores0/1 [Q,N], x0n/x1n [Q,N,2],
    norm_threshs [Q], optional valid0/valid1 [Q,N].
    Returns per-queue-index outputs (indices0 [Q,N], mscores0, R, t,
    has_pose, converged, stopped_at, n_steps/completed diagnostics).
    """
    from impx.ops.pallas.sinkhorn import sinkhorn_fused_stats
    from impx.ransac.pose_solver import (estimate_pose_from_matches,
                                         prior_essential)

    cfg = model.config
    assert cfg.norm_fn == "in"
    interpret = _interpret()
    compute_dtype = model.compute_dtype
    nL = cfg.n_layers
    h = cfg.num_heads
    dh = cfg.descriptor_dim // h
    D = cfg.descriptor_dim
    segs = _segments(nL, valid_its)
    S = len(segs)  # tag S == done
    # static sharing pattern: layer li's self block is sharing[2*li], cross
    # is sharing[2*li+1]. Layer indices are Python ints here, so sharing is
    # resolved at trace time — sharing layers skip the q/k projections
    # entirely and fresh layers skip the runtime select.
    sharing = cfg.sharing_layers(getattr(model, "sharing", False))
    # qk state must cross segment boundaries only if some NON-FIRST segment
    # STARTS with a sharing layer. With the reference checkpoint grid
    # (valid_its 3,5,7,...: segments start on even layers) and the DGNNS
    # sharing pattern (odd layers >= 3 share), it never does — the four
    # [Q,2,H,N,dh] carry buffers and their per-step gather/scatter vanish.
    carry_qk = any(sharing[2 * layers[0]] or sharing[2 * layers[0] + 1]
                   for layers, _ in segs[1:])

    Q, n = queue["descriptors0"].shape[:2]
    B = min(batch, Q)  # both trace-time constants
    # per-pair identity for the RANSAC key: scheduling- AND order-invariant
    # (permuting the queue permutes results bitwise; tested)
    pair_ids = queue.get("pair_ids")
    if pair_ids is None:
        pair_ids = jnp.arange(Q, dtype=jnp.int32)
    valid0_q = queue.get("valid0")
    valid1_q = queue.get("valid1")
    if valid0_q is None:
        valid0_q = jnp.ones((Q, n), bool)
    if valid1_q is None:
        valid1_q = jnp.ones((Q, n), bool)

    # encode every queue pair once up front (cheap MLP over [Q,N,*])
    enc0, _ = model.encode_keypoint(
        {"kenc": stacked["kenc"]}, queue["norm_keypoints0"],
        queue["scores0"], valid0_q)
    enc1, _ = model.encode_keypoint(
        {"kenc": stacked["kenc"]}, queue["norm_keypoints1"],
        queue["scores1"], valid1_q)
    dt = compute_dtype or jnp.float32
    # evolving per-pair state, queue-indexed ([Q, 2, ...]: image halves)
    buf = {
        "desc": jnp.stack([(queue["descriptors0"] + enc0).astype(dt),
                           (queue["descriptors1"] + enc1).astype(dt)], 1),
        "R": jnp.broadcast_to(jnp.eye(3), (Q, 3, 3)),
        "t": jnp.zeros((Q, 3)),
        "has_pose": jnp.zeros((Q,), bool),
        "converged": jnp.zeros((Q,), bool),
        "stopped_at": jnp.full((Q,), nL, jnp.int32),
        "indices0": jnp.full((Q, n), -1, jnp.int32),
        "mscores0": jnp.zeros((Q, n), jnp.float32),
    }
    if carry_qk:
        for name in ("qs_q", "qs_k", "qc_q", "qc_k"):
            buf[name] = jnp.zeros((Q, 2, h, n, dh), dt)
    x0n_q = queue["x0n"].astype(jnp.float32)
    x1n_q = queue["x1n"].astype(jnp.float32)
    thresh_q = queue["norm_threshs"]

    def seg_branch(layers: tuple, ckpt):
        """Build the segment function for one cohort batch. Operands are the
        gathered per-slot state (stacked [2B] image-halves layout); layer
        weights are closed-over trace-time constants — no per-slot gathers."""
        def run(desc, qk_self, qk_cross, keep, keep_swap, st, idx, active):
            def swap(x):
                return jnp.concatenate([x[B:], x[:B]], axis=0)

            for li in layers:
                L_self = jax.tree.map(lambda x, li=li: x[li], stacked["self"])
                L_cross = jax.tree.map(lambda x, li=li: x[li],
                                       stacked["cross"])
                delta, qk_self = _attn_block(
                    L_self, desc, desc, qk_self, keep, keep,
                    h, cfg.ac_fn, compute_dtype, interpret,
                    shared_static=sharing[2 * li])
                desc = desc + delta
                delta, qk_cross = _attn_block(
                    L_cross, desc, swap(desc), qk_cross, keep_swap, keep,
                    h, cfg.ac_fn, compute_dtype, interpret,
                    shared_static=sharing[2 * li + 1])
                desc = desc + delta

            if ckpt is not None:
                st = checkpoint(desc, keep, st, idx, active, ckpt)
            return desc, qk_self, qk_cross, st
        return run

    def checkpoint(desc, keep, st, idx, active, li: int):
        """Pose checkpoint after layer `li` (a Python int: final_proj weights
        are static). Mirrors iterative_fused's `check` semantics."""
        fw = stacked["final_w"][li]
        fb = stacked["final_b"][li]
        d0 = desc[:B].astype(jnp.float32)
        d1 = desc[B:].astype(jnp.float32)
        md0 = jnp.einsum("bnd,de->bne", d0, fw) + fb
        md1 = jnp.einsum("bnd,de->bne", d1, fw) + fb
        dist = jnp.einsum("bnd,bmd->bnm", md0, md1) / (D ** 0.5)
        stats = sinkhorn_fused_stats(
            dist, stacked["bin_score"], cfg.sinkhorn_iterations,
            keep[:B], keep[B:], interpret=interpret)
        idx0, _, ms0, _ = matches_from_stats(
            stats["max0"], stats["idx0"], stats["idx1"], match_ratio,
            keep[:B], keep[B:])

        m_valid = idx0 > -1
        n_matches = jnp.sum(m_valid, axis=1)
        # scheduling-invariant keys (see module docstring)
        pair_keys = jax.vmap(lambda pid: jax.random.fold_in(key, pid))(
            pair_ids[idx])
        E_prev = jax.vmap(prior_essential)(st["R"], st["t"], st["has_pose"])
        pose = jax.vmap(
            lambda k, a, bb, i0, ms, th, ei: estimate_pose_from_matches(
                k, a, bb, i0, ms, th, bucket=ransac_bucket,
                num_hypotheses=num_hypotheses, sample_size=sample_size,
                E_init=ei)
        )(pair_keys, x0n_q[idx], x1n_q[idx], idx0, ms0, thresh_q[idx], E_prev)

        enough = n_matches >= min_kpts
        pose_ok = pose["num_inliers"] >= 5
        diff = jax.vmap(_pose_diff_deg)(st["R"], st["t"], pose["R"], pose["t"])
        diff = jnp.where(st["has_pose"] & pose_ok & enough, diff, jnp.inf)
        newly = active & enough & (diff <= pose_stop_deg)
        inlier_idx0 = jnp.where(m_valid & pose["inliers"], idx0, -1)

        upd = active & enough & pose_ok
        st = dict(st)
        st["R"] = jnp.where(upd[:, None, None], pose["R"], st["R"])
        st["t"] = jnp.where(upd[:, None], pose["t"], st["t"])
        st["has_pose"] = jnp.where(active, enough & pose_ok, st["has_pose"])
        st["indices0"] = jnp.where(
            newly[:, None], inlier_idx0,
            jnp.where(active[:, None], idx0, st["indices0"]))
        st["mscores0"] = jnp.where(active[:, None], ms0, st["mscores0"])
        st["stopped_at"] = jnp.where(newly, li + 1, st["stopped_at"])
        st["converged"] = st["converged"] | newly
        return st

    branches = [seg_branch(layers, ckpt) for layers, ckpt in segs]

    def body(carry):
        buf, tags, steps = carry
        # fullest cohort wins; ties go to the deepest (drains the buffer)
        counts = jnp.sum(jax.nn.one_hot(tags, S, dtype=jnp.int32), axis=0)
        score = jnp.minimum(counts, B) * S + jnp.arange(S)
        score = jnp.where(counts > 0, score, -1)
        s_star = jnp.argmax(score)

        in_stage = tags == s_star
        order = jnp.argsort(~in_stage)  # stable: cohort members first
        idx = order[:B]
        active = in_stage[idx]

        # gather the cohort into the stacked [2B] layout
        tohalves = lambda x: jnp.concatenate([x[:, 0], x[:, 1]], axis=0)
        desc = tohalves(buf["desc"][idx])
        if carry_qk:
            qk_self = {"q": tohalves(buf["qs_q"][idx]),
                       "k": tohalves(buf["qs_k"][idx])}
            qk_cross = {"q": tohalves(buf["qc_q"][idx]),
                        "k": tohalves(buf["qc_k"][idx])}
        else:
            # never read (every segment starts with a fresh layer): dummy
            # operands, DCE'd inside the branches
            zeros = jnp.zeros((2 * B, h, n, dh), dt)
            qk_self = {"q": zeros, "k": zeros}
            qk_cross = {"q": zeros, "k": zeros}
        keep0, keep1 = valid0_q[idx], valid1_q[idx]
        keep = jnp.concatenate([keep0, keep1], axis=0)
        keep_swap = jnp.concatenate([keep1, keep0], axis=0)
        st = {k: buf[k][idx] for k in ("R", "t", "has_pose", "converged",
                                       "stopped_at", "indices0", "mscores0")}

        desc, qk_self, qk_cross, st = jax.lax.switch(
            s_star, branches, desc, qk_self, qk_cross, keep, keep_swap, st,
            idx, active & ~st["converged"])

        # scatter back (idx entries are distinct; inactive slots re-write
        # their untouched gathered values)
        frompairs = lambda x: jnp.stack([x[:B], x[B:]], axis=1)
        buf = dict(buf)
        buf["desc"] = buf["desc"].at[idx].set(
            jnp.where(active[:, None, None, None], frompairs(desc),
                      buf["desc"][idx]))
        if carry_qk:
            for name, val in (("qs_q", qk_self["q"]), ("qs_k", qk_self["k"]),
                              ("qc_q", qk_cross["q"]), ("qc_k", qk_cross["k"])):
                buf[name] = buf[name].at[idx].set(
                    jnp.where(active[:, None, None, None, None],
                              frompairs(val), buf[name][idx]))
        for name in ("R", "t", "has_pose", "converged", "stopped_at",
                     "indices0", "mscores0"):
            old = buf[name][idx]
            mask = active.reshape((B,) + (1,) * (old.ndim - 1))
            buf[name] = buf[name].at[idx].set(jnp.where(mask, st[name], old))

        # advance tags: next stage, or done when converged / out of segments
        new_tag = jnp.where(st["converged"] | (s_star == S - 1),
                            S, s_star + 1).astype(tags.dtype)
        tags = tags.at[idx].set(jnp.where(active, new_tag, tags[idx]))
        return buf, tags, steps + 1

    def cond(carry):
        _, tags, steps = carry
        return jnp.any(tags < S) & (steps < Q * S)

    tags0 = jnp.zeros((Q,), jnp.int32)
    buf, tags, steps = jax.lax.while_loop(
        cond, body, (buf, tags0, jnp.zeros((), jnp.int32)))

    out = {k: buf[k] for k in ("indices0", "mscores0", "R", "t", "has_pose",
                               "converged", "stopped_at")}
    out["n_steps"] = steps
    out["completed"] = jnp.sum(tags >= S)
    return out


def run_iterative_staged(model, params, queue, key, batch=8, **kw):
    """Convenience wrapper: stacks params and runs the cohort loop."""
    stacked = stack_params(params, model.config)
    return iterative_staged_queue(model, stacked, queue, key, batch=batch,
                                  **kw)
