"""Iterative matching <-> pose loop with DYNAMIC SLOT REFILL: one jit program
that keeps every batch slot busy.

The fully-fused batched loop (impx/eval/iterative_fused.py) advances all B
pairs in lockstep through the 15-layer program: a pair that converges at
iteration 6 keeps burning attention/Sinkhorn FLOPs until the LAST pair in the
batch finishes — with the measured bimodal stop distribution (~27% stop at 6,
~42% run all 15; STATUS.md probe) that wastes ~30% of the compute. This
variant instead runs a device-side work queue: each slot carries its OWN
layer index, and the moment a pair converges (or exhausts its 15 iterations,
reference eval/matching.py:110-117 semantics) its results are scattered to a
queue-indexed output buffer and the slot is reloaded with the next pending
pair — zero host round-trips, every slot busy until the queue drains.

What changes vs the lockstep loop:
  * layer weights are GATHERED per slot (each slot may sit at a different
    depth), so the projection/merge/MLP matmuls run with a batched weight
    operand — same FLOPs, one extra [B]-indexed gather of ~1 MB/layer;
  * pose checkpoints fire per slot whenever that slot's layer index is in
    VALID_ITS (reference eval/matching.py:43), so the RANSAC stage runs with
    a per-slot mask instead of on globally-aligned iterations;
  * per-pair results are independent of scheduling: the RANSAC key of a
    checkpoint is derived from the pair's IDENTITY only (fold_in(key,
    pair_ids[qidx]); pair_ids defaults to the queue position), never from
    the slot or the global step. Queue-order invariance is bitwise (same
    shapes, same program); across different slot COUNTS the XLA program
    changes, so agreement is up to fp rounding at the pose-stop threshold
    (both pinned by tests/test_iterative_e2e.py).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from impx.eval.iterative import VALID_ITS, _pose_diff_deg
from impx.models.fast import stack_params
from impx.ops.attention import _interpret
from impx.ops.matching import matches_from_stats
from impx.ops.norms import instance_norm


def _proj_heads_b(w, b, x, num_heads):
    """Per-slot dense projection into [2B,H,N,dh] (head-minor channel order,
    like impx/models/fast._proj_heads but with a batched weight operand)."""
    tb, cin, cout = w.shape
    dh = cout // num_heads
    wr = w.reshape(tb, cin, dh, num_heads)
    br = b.reshape(tb, dh, num_heads)
    y = jnp.einsum("bnc,bcdh->bhnd", x, wr.astype(x.dtype))
    return y + jnp.transpose(br, (0, 2, 1))[:, :, None, :].astype(y.dtype)


def _merge_heads_b(w, b, x):
    tb, h, n, dh = x.shape
    wr = w.reshape(tb, dh, h, w.shape[-1])
    return jnp.einsum("bhnd,bdho->bno", x, wr.astype(x.dtype)) + \
        b[:, None, :].astype(x.dtype)


def _attn_block_slotted(L, x, source, qk_carry, key_mask, query_mask,
                        num_heads, ac_fn, interpret):
    """One attentional-propagation layer where every batch element carries its
    own layer's weights (leading dim on every leaf of L)."""
    from impx.ops.pallas.attention import mha_fused

    q_new = _proj_heads_b(L["q"]["w"], L["q"]["b"], x, num_heads)
    k_new = _proj_heads_b(L["k"]["w"], L["k"]["b"], source, num_heads)
    v = _proj_heads_b(L["v"]["w"], L["v"]["b"], source, num_heads)

    shared = (L["shared"] > 0.5)[:, None, None, None]
    q_used = jnp.where(shared, qk_carry["q"], q_new)
    k_used = jnp.where(shared, qk_carry["k"], k_new)

    out = mha_fused(q_used, k_used, v, key_mask, interpret=interpret)
    message = _merge_heads_b(L["merge"]["w"], L["merge"]["b"],
                             out.astype(x.dtype))
    y = jnp.concatenate([x, message], axis=-1)
    h = jnp.einsum("bnc,bcd->bnd", y, L["mlp0"]["w"].astype(y.dtype)) + \
        L["mlp0"]["b"][:, None, :].astype(y.dtype)
    h = instance_norm(h.astype(jnp.float32), mask=query_mask).astype(y.dtype)
    if ac_fn == "relu":
        h = jax.nn.relu(h)
    elif ac_fn == "gelu":
        h = jax.nn.gelu(h, approximate=False)
    else:
        h = jax.nn.leaky_relu(h, negative_slope=0.1)
    delta = jnp.einsum("bnc,bcd->bnd", h, L["mlp1"]["w"].astype(h.dtype)) + \
        L["mlp1"]["b"][:, None, :].astype(h.dtype)
    return delta, {"q": q_used, "k": k_used}


def _gather_layers(tree, li):
    """Per-slot layer slice of a stacked per-layer pytree, duplicated onto
    both image halves: leaf [L, ...] -> [2B, ...]."""
    def take(x):
        g = x[li]
        return jnp.concatenate([g, g], axis=0)
    return jax.tree.map(take, tree)


@partial(jax.jit, static_argnames=(
    "model", "slots", "valid_its", "match_ratio", "min_kpts", "pose_stop_deg",
    "num_hypotheses", "sample_size", "ransac_bucket"))
def iterative_refill_queue(
    model,
    stacked: dict,
    queue: dict,
    key: jax.Array,
    slots: int = 16,
    valid_its: tuple = VALID_ITS,
    match_ratio: float = 0.1,
    min_kpts: int = 25,
    pose_stop_deg: float = 1.5,
    num_hypotheses: int = 256,
    sample_size: int = 5,
    ransac_bucket: int = 512,
):
    """Drain a device-resident queue of Q pairs through `slots` active slots.

    queue: dict of per-pair arrays — descriptors0/1 [Q,N,D],
    norm_keypoints0/1 [Q,N,2], scores0/1 [Q,N], x0n/x1n [Q,N,2],
    norm_threshs [Q], optional valid0/valid1 [Q,N].
    Returns per-QUEUE-INDEX outputs (indices0 [Q,N], mscores0, R, t,
    has_pose, converged, stopped_at, n_steps scalar diagnostics).
    """
    from impx.ops.pallas.sinkhorn import sinkhorn_fused_stats
    from impx.ransac.pose_solver import (estimate_pose_from_matches,
                                         prior_essential)

    cfg = model.config
    assert cfg.norm_fn == "in"
    interpret = _interpret()
    compute_dtype = model.compute_dtype
    nL = cfg.n_layers
    B = slots

    Q, n = queue["descriptors0"].shape[:2]
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
    qdesc0 = (queue["descriptors0"] + enc0)
    qdesc1 = (queue["descriptors1"] + enc1)
    if compute_dtype is not None:
        qdesc0 = qdesc0.astype(compute_dtype)
        qdesc1 = qdesc1.astype(compute_dtype)

    h = cfg.num_heads
    dh = cfg.descriptor_dim // h
    check_table = jnp.asarray([1.0 if i in valid_its else 0.0
                               for i in range(nL)], jnp.float32)

    def load(state, refill, new_qidx):
        """(Re)load refilled slots from the queue; `refill` [B] bool,
        `new_qidx` [B] (only read where refill)."""
        qi = jnp.clip(new_qidx, 0, Q - 1)
        r1 = refill[:, None]
        r2 = refill[:, None, None]
        r2b = jnp.concatenate([r2, r2], axis=0)
        d_new = jnp.concatenate([qdesc0[qi], qdesc1[qi]], axis=0)
        state = dict(state)
        state["desc"] = jnp.where(r2b, d_new, state["desc"])
        zq = jnp.zeros((), state["qk_self"]["q"].dtype)
        r4 = jnp.concatenate([refill, refill])[:, None, None, None]
        state["qk_self"] = jax.tree.map(
            lambda t: jnp.where(r4, zq, t), state["qk_self"])
        state["qk_cross"] = jax.tree.map(
            lambda t: jnp.where(r4, zq, t), state["qk_cross"])
        state["keep0"] = jnp.where(r1, valid0_q[qi], state["keep0"])
        state["keep1"] = jnp.where(r1, valid1_q[qi], state["keep1"])
        state["x0n"] = jnp.where(r2, queue["x0n"][qi], state["x0n"])
        state["x1n"] = jnp.where(r2, queue["x1n"][qi], state["x1n"])
        state["thresh"] = jnp.where(refill, queue["norm_threshs"][qi],
                                    state["thresh"])
        state["li"] = jnp.where(refill, 0, state["li"])
        state["qidx"] = jnp.where(refill, new_qidx, state["qidx"])
        state["active"] = jnp.where(refill, new_qidx < Q, state["active"])
        state["R"] = jnp.where(r2, jnp.eye(3)[None], state["R"])
        state["t"] = jnp.where(r1, 0.0, state["t"])
        state["has_pose"] = jnp.where(refill, False, state["has_pose"])
        state["converged"] = jnp.where(refill, False, state["converged"])
        state["stopped_at"] = jnp.where(refill, nL, state["stopped_at"])
        state["indices0"] = jnp.where(r1, -1, state["indices0"])
        state["mscores0"] = jnp.where(r1, 0.0, state["mscores0"])
        return state

    def checkpoint(state, need):
        """Per-slot pose checkpoint (mirrors iterative_fused's `check`)."""
        li = jnp.clip(state["li"], 0, nL - 1)
        fw = stacked["final_w"][li]            # [B, D, D]
        fb = stacked["final_b"][li]
        d0 = state["desc"][:B].astype(jnp.float32)
        d1 = state["desc"][B:].astype(jnp.float32)
        md0 = jnp.einsum("bnd,bde->bne", d0, fw) + fb[:, None, :]
        md1 = jnp.einsum("bnd,bde->bne", d1, fw) + fb[:, None, :]
        dist = jnp.einsum("bnd,bmd->bnm", md0, md1) / \
            (cfg.descriptor_dim ** 0.5)
        stats = sinkhorn_fused_stats(
            dist, stacked["bin_score"], cfg.sinkhorn_iterations,
            state["keep0"], state["keep1"], interpret=interpret)
        idx0, _, ms0, _ = matches_from_stats(
            stats["max0"], stats["idx0"], stats["idx1"], match_ratio,
            state["keep0"], state["keep1"])

        m_valid = idx0 > -1
        n_matches = jnp.sum(m_valid, axis=1)
        # scheduling-invariant keys: derived from the pair's IDENTITY only
        # (never the slot, queue position, or global step), and REUSED across
        # a pair's checkpoints so consecutive checkpoints draw the same
        # minimal sets and the pose-diff stop measures the matcher's change,
        # not RANSAC sampling noise (same discipline as the lockstep bench /
        # cv2's deterministic seeding)
        pair_keys = jax.vmap(lambda pid: jax.random.fold_in(key, pid))(
            pair_ids[jnp.clip(state["qidx"], 0, Q - 1)])
        # previous checkpoint's pose warm-starts LO (see iterative_fused.py)
        E_prev = jax.vmap(prior_essential)(state["R"], state["t"],
                                           state["has_pose"])
        pose = jax.vmap(
            lambda k, a, bb, i0, ms, th, ei: estimate_pose_from_matches(
                k, a, bb, i0, ms, th, bucket=ransac_bucket,
                num_hypotheses=num_hypotheses, sample_size=sample_size,
                E_init=ei)
        )(pair_keys, state["x0n"], state["x1n"], idx0, ms0, state["thresh"],
          E_prev)

        enough = n_matches >= min_kpts
        pose_ok = pose["num_inliers"] >= 5
        diff = jax.vmap(_pose_diff_deg)(state["R"], state["t"],
                                        pose["R"], pose["t"])
        diff = jnp.where(state["has_pose"] & pose_ok & enough, diff, jnp.inf)
        newly = need & enough & (diff <= pose_stop_deg) & ~state["converged"]
        inlier_idx0 = jnp.where(m_valid & pose["inliers"], idx0, -1)

        upd = need & enough & pose_ok
        state = dict(state)
        state["R"] = jnp.where(upd[:, None, None], pose["R"], state["R"])
        state["t"] = jnp.where(upd[:, None], pose["t"], state["t"])
        state["has_pose"] = jnp.where(need, enough & pose_ok,
                                      state["has_pose"])
        state["indices0"] = jnp.where(
            newly[:, None], inlier_idx0,
            jnp.where(need[:, None], idx0, state["indices0"]))
        state["mscores0"] = jnp.where(need[:, None], ms0, state["mscores0"])
        state["stopped_at"] = jnp.where(newly, state["li"] + 1,
                                        state["stopped_at"])
        state["converged"] = state["converged"] | newly
        return state

    def body(carry):
        state, results, next_ptr, completed, steps = carry

        # one self+cross layer at each slot's own depth
        keep = jnp.concatenate([state["keep0"], state["keep1"]], axis=0)
        keep_swap = jnp.concatenate([state["keep1"], state["keep0"]], axis=0)
        li = jnp.clip(state["li"], 0, nL - 1)
        L_self = _gather_layers(stacked["self"], li)
        L_cross = _gather_layers(stacked["cross"], li)

        def swap(x):
            return jnp.concatenate([x[B:], x[:B]], axis=0)

        desc = state["desc"]
        delta, qk_self = _attn_block_slotted(
            L_self, desc, desc, state["qk_self"], keep, keep,
            h, cfg.ac_fn, interpret)
        desc = desc + delta
        delta, qk_cross = _attn_block_slotted(
            L_cross, desc, swap(desc), state["qk_cross"], keep_swap, keep,
            h, cfg.ac_fn, interpret)
        desc = desc + delta
        state = dict(state, desc=desc, qk_self=qk_self, qk_cross=qk_cross)

        need = (check_table[li] > 0.5) & state["active"] & \
            ~state["converged"] & (state["li"] < nL)
        state = jax.lax.cond(jnp.any(need), checkpoint,
                             lambda s, _n: s, state, need)

        state["li"] = jnp.where(state["active"] & (state["li"] < nL),
                                state["li"] + 1, state["li"])

        # retire finished slots (converged or out of iterations), PARITY
        # SNAPPED: refills only happen on even global steps, so every slot's
        # layer index keeps li parity == step parity and the (mostly odd)
        # VALID_ITS checkpoints of all slots land on SHARED steps — the
        # Sinkhorn+RANSAC stage then fires at the lockstep loop's cadence
        # (~every 2nd step) instead of nearly every step once slots desync.
        # Costs at most one idle iteration per retiring pair.
        done = state["active"] & (state["converged"] |
                                  (state["li"] >= nL)) & (steps % 2 == 0)
        # scatter ONLY retiring slots: exhausted slots carry qidx >= Q, and
        # clipping them into range would alias the LAST queue pair — a
        # duplicate-index scatter whose write order XLA leaves undefined
        # (observed: pair Q-1's result clobbered with its stale value when
        # the queue wraps). mode="drop" discards the out-of-range rows.
        qi = jnp.where(done, state["qidx"], Q)
        for name in ("indices0", "mscores0", "R", "t", "has_pose",
                     "converged", "stopped_at"):
            results[name] = results[name].at[qi].set(state[name], mode="drop")
        completed = completed + jnp.sum(done)

        # ... and refill them from the queue head
        offs = jnp.cumsum(done.astype(jnp.int32)) - done.astype(jnp.int32)
        new_qidx = jnp.where(done, next_ptr + offs, state["qidx"])
        state = load(state, done, new_qidx)
        next_ptr = next_ptr + jnp.sum(done.astype(jnp.int32))
        return state, results, next_ptr, completed, steps + 1

    # parity-snapped retires add <= 1 idle step per pair to the bound
    max_steps = (nL + 2) * ((Q + B - 1) // B) + nL + 2
    def cond(carry):
        _, _, _, completed, steps = carry
        return (completed < Q) & (steps < max_steps)

    zdesc = jnp.zeros((2 * B, n, cfg.descriptor_dim),
                      compute_dtype or jnp.float32)
    zqk = {"q": jnp.zeros((2 * B, h, n, dh), compute_dtype or jnp.float32),
           "k": jnp.zeros((2 * B, h, n, dh), compute_dtype or jnp.float32)}
    state0 = {
        "desc": zdesc, "qk_self": zqk, "qk_cross": zqk,
        "keep0": jnp.ones((B, n), bool), "keep1": jnp.ones((B, n), bool),
        "x0n": jnp.zeros((B, n, 2)), "x1n": jnp.zeros((B, n, 2)),
        "thresh": jnp.ones((B,)),
        "li": jnp.zeros((B,), jnp.int32),
        "qidx": jnp.full((B,), -1, jnp.int32),
        "active": jnp.zeros((B,), bool),
        "R": jnp.broadcast_to(jnp.eye(3), (B, 3, 3)),
        "t": jnp.zeros((B, 3)),
        "has_pose": jnp.zeros((B,), bool),
        "converged": jnp.zeros((B,), bool),
        "stopped_at": jnp.full((B,), nL, jnp.int32),
        "indices0": jnp.full((B, n), -1, jnp.int32),
        "mscores0": jnp.zeros((B, n), jnp.float32),
    }
    state0 = load(state0, jnp.ones((B,), bool), jnp.arange(B, dtype=jnp.int32))
    results0 = {
        "indices0": jnp.full((Q, n), -1, jnp.int32),
        "mscores0": jnp.zeros((Q, n), jnp.float32),
        "R": jnp.broadcast_to(jnp.eye(3), (Q, 3, 3)),
        "t": jnp.zeros((Q, 3)),
        "has_pose": jnp.zeros((Q,), bool),
        "converged": jnp.zeros((Q,), bool),
        "stopped_at": jnp.full((Q,), nL, jnp.int32),
    }
    _, results, _, completed, steps = jax.lax.while_loop(
        cond, body, (state0, results0, jnp.asarray(B, jnp.int32),
                     jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32)))
    results["n_steps"] = steps
    results["completed"] = completed
    return results


def run_iterative_refill(model, params, queue, key, slots=16, **kw):
    """Convenience wrapper: stacks params and runs the queue loop."""
    stacked = stack_params(params, model.config)
    return iterative_refill_queue(model, stacked, queue, key, slots=slots,
                                  **kw)
