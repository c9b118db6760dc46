"""Iterative matching <-> pose estimation with early stopping.

This is THE signature algorithm of IMP (reference eval/matching.py:16-123
`matching_iterative` and :126-276 `matching_iterative_uncertainty`): run two
attention layers at a time; at designated iterations extract matches, estimate
the relative pose, and stop as soon as the pose stops changing (<= 1.5 deg).

The reference pays a device->host round trip of the full match tensors plus a
host OpenCV MAGSAC at every check. TPU-native design here:

  * per-iteration layer step: one small jit program per layer pair
    (compiled once, reused across all pairs);
  * checkpoint program: score -> Sinkhorn -> mutual-NN matches -> batched
    on-device RANSAC -> cheirality pose -> pose-diff, compiled ONCE and
    reused at every checkpoint of every pair;
  * the host loop reads back a single scalar (converged flag) per checkpoint
    — 4 bytes instead of the reference's full matrices — and breaks early,
    which actually skips the remaining layers' FLOPs.

EIMP uncertainty variant: adaptive pooling between iterations via keep-masks
with the pose-inlier-ratio-scaled threshold mscore_th = 0.2 * inlier_ratio
(reference matching.py:243-257) — masks only, no array slicing.

A fully-fused single-program variant (everything including the early exit
inside one jit via lax.cond) is possible but compiles the RANSAC graph once
per checkpoint; the host-driven structure compiles ~10x faster and exposes
identical semantics.
"""
from __future__ import annotations

from functools import partial
from typing import Any

import numpy as np
import jax
import jax.numpy as jnp

VALID_ITS = (3, 5, 7, 9, 11, 13, 14)  # reference eval/matching.py:43


def _pose_diff_deg(R1, t1, R2, t2):
    cos_r = jnp.clip((jnp.trace(R1.T @ R2) - 1.0) / 2.0, -1.0, 1.0)
    dr = jnp.rad2deg(jnp.abs(jnp.arccos(cos_r)))
    n = jnp.linalg.norm(t1) * jnp.linalg.norm(t2)
    dt = jnp.rad2deg(jnp.arccos(jnp.clip(jnp.dot(t1, t2) / (n + 1e-15), -1.0, 1.0)))
    return jnp.maximum(dr, dt)


class IterativeMatcher:
    """Reusable jit programs for the iterative loop at one padding bucket."""

    def __init__(self, model, params, *, norm_thresh: float, match_ratio: float = 0.1,
                 min_kpts: int = 25, pose_stop_deg: float = 1.5,
                 num_hypotheses: int = 256, with_uncertainty: bool = False,
                 mscore_base: float = 0.2, valid_its: tuple = VALID_ITS,
                 sample_size: int = 5, checkpoint_backend: str = "jax"):
        self.model = model
        self.params = params
        self.valid_its = tuple(valid_its)
        self.norm_thresh = norm_thresh
        self.match_ratio = match_ratio
        self.min_kpts = min_kpts
        self.pose_stop_deg = pose_stop_deg
        # 256 score-weighted hypotheses match 512+ uniform ones in accuracy
        # (STATUS.md checkpoint-solver study) at a fraction of the cost
        self.num_hypotheses = num_hypotheses
        # 5 = Nistér minimal solver: on the synthetic study it matches or
        # beats cv2 MAGSAC everywhere, while 8-point minimal sets degrade
        # sharply with noise+outliers (STATUS.md pose-study table) — pose
        # stability is what the <=1.5 deg stopping criterion rides on
        self.sample_size = sample_size
        self.with_uncertainty = with_uncertainty
        self.mscore_base = mscore_base
        # "jax": on-device RANSAC at every checkpoint (the TPU-native design);
        # "cv2": host OpenCV USAC_MAGSAC at every checkpoint — byte-for-byte
        # the reference's checkpoint solver (eval/matching.py:84-87), kept to
        # isolate matcher-vs-backend divergence in cross-framework studies.
        assert checkpoint_backend in ("jax", "cv2"), checkpoint_backend
        self.checkpoint_backend = checkpoint_backend

        self._encode = jax.jit(self._encode_impl)
        self._match_at_j = jax.jit(self._match_at_impl)
        # one compiled step per layer-pair index (parameter structures differ
        # between shared/non-shared layers, so ni is static)
        self._steps = [
            jax.jit(partial(self._step_impl, ni)) for ni in range(model.config.n_layers)
        ]
        self._check = jax.jit(self._check_impl)
        if with_uncertainty:
            self._pool = jax.jit(self._pool_impl)

    # ------------------------------------------------------------- jit bodies
    def _encode_impl(self, data):
        model, params = self.model, self.params
        valid0 = data["valid0"]
        valid1 = data["valid1"]
        enc0, _ = model.encode_keypoint(params, data["norm_keypoints0"], data["scores0"], valid0)
        enc1, _ = model.encode_keypoint(params, data["norm_keypoints1"], data["scores1"], valid1)
        return data["descriptors0"] + enc0, data["descriptors1"] + enc1

    def _step_impl(self, ni, desc0, desc1, probs, keep0, keep1):
        """Two layers (self, cross) with carried shared probs + keep masks.
        probs: (p00, p11, p10, p01) or Nones at ni == 0."""
        model, params = self.model, self.params
        p00, p11, p10, p01 = probs
        layer = params["gnn"][ni * 2]
        d0, p00, _ = model._apply_layer(layer, desc0, desc0, prob=p00,
                                        key_mask=keep0, query_mask=keep0)
        d1, p11, _ = model._apply_layer(layer, desc1, desc1, prob=p11,
                                        key_mask=keep1, query_mask=keep1)
        desc0 = desc0 + d0
        desc1 = desc1 + d1
        layer = params["gnn"][ni * 2 + 1]
        d0, p10, _ = model._apply_layer(layer, desc0, desc1, prob=p10,
                                        key_mask=keep1, query_mask=keep0)
        d1, p01, _ = model._apply_layer(layer, desc1, desc0, prob=p01,
                                        key_mask=keep0, query_mask=keep1)
        return desc0 + d0, desc1 + d1, (p00, p11, p10, p01)

    def _score_at(self, ni, desc0, desc1, keep0, keep1, p):
        model, params = self.model, self.params
        dist = model.compute_distance(params, desc0, desc1, layer_id=ni)
        score = model.compute_score(params, dist, keep0, keep1)
        idx0, idx1, ms0, ms1 = model.compute_matches(score, p=p, valid0=keep0, valid1=keep1)
        return score, idx0, ms0

    def _match_at_impl(self, ni, desc0, desc1, keep0, keep1):
        """Checkpoint match extraction WITHOUT the on-device RANSAC — the
        device half of the cv2 checkpoint backend (the host half mirrors
        reference eval/matching.py:62-117). Compiles once (ni traced)."""
        model, params = self.model, self.params
        fw = jnp.stack([p["w"] for p in params["final_proj"]])
        fb = jnp.stack([p["b"] for p in params["final_proj"]])
        mdesc0 = jnp.einsum("bnc,cd->bnd", desc0, fw[ni]) + fb[ni]
        mdesc1 = jnp.einsum("bnc,cd->bnd", desc1, fw[ni]) + fb[ni]
        dist = jnp.einsum("bnd,bmd->bnm", mdesc0, mdesc1) / (
            model.config.descriptor_dim ** 0.5)
        score = model.compute_score(params, dist, keep0, keep1)
        idx0, idx1, ms0, ms1 = model.compute_matches(
            score, p=self.match_ratio, valid0=keep0, valid1=keep1)
        return score, idx0, ms0

    def _check_impl(self, ni, desc0, desc1, keep0, keep1, x0n, x1n,
                    last_R, last_t, has_pose, key, norm_thresh):
        """One convergence check; ni is a traced scalar used only to select
        final_proj weights, so this compiles once."""
        from impx.ransac.pose_solver import (estimate_pose_from_matches,
                                             prior_essential)

        model, params = self.model, self.params
        # dynamic layer select: stack final_proj weights once, gather at ni
        fw = jnp.stack([p["w"] for p in params["final_proj"]])
        fb = jnp.stack([p["b"] for p in params["final_proj"]])
        mdesc0 = jnp.einsum("bnc,cd->bnd", desc0, fw[ni]) + fb[ni]
        mdesc1 = jnp.einsum("bnc,cd->bnd", desc1, fw[ni]) + fb[ni]
        dist = jnp.einsum("bnd,bmd->bnm", mdesc0, mdesc1) / (
            model.config.descriptor_dim ** 0.5)
        score = model.compute_score(params, dist, keep0, keep1)
        idx0, idx1, ms0, ms1 = model.compute_matches(
            score, p=self.match_ratio, valid0=keep0, valid1=keep1)

        m_valid = idx0[0] > -1
        n_matches = jnp.sum(m_valid)
        # match-compacted score-weighted RANSAC (see estimate_pose_from_matches)
        # warm-started from the previous checkpoint's pose
        pose = estimate_pose_from_matches(
            key, x0n, x1n, idx0[0], ms0[0], norm_thresh,
            num_hypotheses=self.num_hypotheses, sample_size=self.sample_size,
            E_init=prior_essential(last_R, last_t, has_pose))
        enough = n_matches >= self.min_kpts
        pose_ok = pose["num_inliers"] >= 5

        diff = jnp.where(has_pose & pose_ok & enough,
                         _pose_diff_deg(last_R, last_t, pose["R"], pose["t"]),
                         jnp.inf)
        converged = enough & (diff <= self.pose_stop_deg)
        inlier_idx0 = jnp.where(m_valid & pose["inliers"], idx0[0], -1)[None]

        R_new = jnp.where(enough & pose_ok, pose["R"], last_R)
        t_new = jnp.where(enough & pose_ok, pose["t"], last_t)
        has_pose_new = enough & pose_ok
        inlier_ratio = jnp.where(n_matches > 0,
                                 pose["num_inliers"] / jnp.maximum(n_matches, 1), 0.0)
        return {
            "converged": converged,
            "R": R_new, "t": t_new, "has_pose": has_pose_new,
            "indices0": jnp.where(converged, inlier_idx0, idx0),
            "mscores0": ms0,
            "score": score,
            "inlier_ratio": inlier_ratio,
        }

    def _pool_impl(self, score, probs, keep0, keep1, mscore_th):
        p00, p11, p10, p01 = probs
        return self.model.pool_masks(score, p00, p01, p11, p10, keep0, keep1,
                                     mscore_th=mscore_th)

    # --------------------------------------------------------------- host loop
    def run(self, data: dict[str, Any], key, norm_thresh=None) -> dict[str, Any]:
        """data: descriptors0/1 [1,N,D], norm_keypoints0/1 [1,N,2],
        scores0/1 [1,N], valid0/1 [1,N], x0n/x1n [N,2] intrinsics-normalized.
        norm_thresh overrides the constructor default per pair (intrinsics
        vary across a dataset; the RANSAC threshold must follow)."""
        if norm_thresh is None:
            norm_thresh = self.norm_thresh
        if self.checkpoint_backend == "cv2":
            return self._run_cv2(data, norm_thresh)
        model = self.model
        n_layers = model.config.n_layers

        desc0, desc1 = self._encode(data)
        keep0, keep1 = data["valid0"], data["valid1"]
        probs = (None, None, None, None)
        R = jnp.eye(3)
        t = jnp.zeros(3)
        has_pose = jnp.asarray(False)
        out = None
        stopped_at = n_layers

        for ni in range(n_layers):
            desc0, desc1, probs = self._steps[ni](desc0, desc1, probs, keep0, keep1)
            if ni not in self.valid_its:
                continue
            key, sub = jax.random.split(key)
            out = self._check(jnp.asarray(ni), desc0, desc1, keep0, keep1,
                              data["x0n"], data["x1n"], R, t, has_pose, sub,
                              jnp.asarray(norm_thresh, jnp.float32))
            R, t, has_pose = out["R"], out["t"], out["has_pose"]

            if self.with_uncertainty:
                ir = out["inlier_ratio"]
                mscore_th = jnp.where(ir > 0, self.mscore_base * ir, self.mscore_base)
                keep0, keep1 = self._pool(out["score"], probs, keep0, keep1, mscore_th)

            if bool(out["converged"]):  # the ONLY host sync: one scalar
                stopped_at = ni + 1
                return {
                    "indices0": out["indices0"][0], "mscores0": out["mscores0"][0],
                    "R": out["R"], "t": out["t"], "has_pose": out["has_pose"],
                    "stopped_at": stopped_at, "converged": True,
                }

        # no convergence: fall back to matches at p=0.2 from the last score
        # (reference matching.py:119-123)
        idx0, _, ms0, _ = model.compute_matches(
            out["score"], p=0.2, valid0=keep0, valid1=keep1)
        return {
            "indices0": np.asarray(idx0[0]), "mscores0": np.asarray(ms0[0]),
            "R": out["R"], "t": out["t"], "has_pose": out["has_pose"],
            "stopped_at": n_layers, "converged": False,
        }


    def _run_cv2(self, data: dict[str, Any], norm_thresh) -> dict[str, Any]:
        """Reference-protocol checkpoints: host cv2 USAC_MAGSAC at every
        valid iteration, exactly eval/matching.py:45-123 (min-kpts reset,
        ret-is-None handling, diff-then-update-then-stop ordering, pose-inlier
        output on convergence, p=0.2 fallback). The layer stepping and match
        extraction stay on device; only the matched coordinate pairs cross to
        the host per checkpoint. Used by cross-framework studies to isolate
        matcher divergence from the pose-backend swap.

        cv2 is fed PIXEL coordinates + the real camera matrices when the feed
        carries them (x0px/x1px/K0/K1 + error_th_px), exactly like the
        reference (matching.py:84-87 passes pts0_cpu + K0/K1 + error_th).
        Feeding intrinsic-normalized coords with identity K is mathematically
        equivalent but NOT behaviorally: cv2's USAC machinery (neighborhood
        grid for local optimization, degeneracy checks) assumes pixel-scale
        coordinates, and on ~[-0.5, 0.5] normalized inputs its checkpoint
        poses jitter enough to defeat the 1.5-degree stop criterion
        (measured: 20.8% convergence vs the reference's 52.1% on the same
        pairs; pixel-space restores parity — see STATUS.md)."""
        from impx.ransac.pose_solver import estimate_pose_cv2

        model = self.model
        n_layers = model.config.n_layers
        desc0, desc1 = self._encode(data)
        keep0, keep1 = data["valid0"], data["valid1"]
        probs = (None, None, None, None)
        if "x0px" in data:
            # raw reader dtype preserved — cv2 USAC is dtype-sensitive
            x0n = np.asarray(data["x0px"])
            x1n = np.asarray(data["x1px"])
            K0 = np.asarray(data["K0"], np.float64)
            K1 = np.asarray(data["K1"], np.float64)
            norm_thresh = float(data.get("error_th_px", 1.0))
        else:
            x0n = np.asarray(data["x0n"], np.float64)
            x1n = np.asarray(data["x1n"], np.float64)
            K0 = K1 = np.eye(3)  # coords are already intrinsic-normalized
        last_R = last_t = None
        score = None
        for ni in range(n_layers):
            desc0, desc1, probs = self._steps[ni](desc0, desc1, probs,
                                                  keep0, keep1)
            if ni not in self.valid_its:
                continue
            score, idx0, ms0 = self._match_at_j(jnp.asarray(ni), desc0, desc1,
                                                keep0, keep1)
            idx0_np = np.asarray(idx0[0])
            ms0_np = np.asarray(ms0[0])
            mids0 = np.where(idx0_np > -1)[0]
            if mids0.size < self.min_kpts:
                # reference matching.py:64-67: too few matches resets the pose
                last_R = last_t = None
                continue
            ret = estimate_pose_cv2(x0n[mids0], x1n[idx0_np[mids0]],
                                    K0, K1, float(norm_thresh))
            if ret is not None:
                _, R, t, inliers = ret
            else:
                R = t = None
                inliers = np.zeros(mids0.size, bool)
            if last_R is not None and R is not None:
                cos = np.clip((np.trace(last_R.T @ R) - 1.0) / 2.0, -1.0, 1.0)
                diff_R = np.rad2deg(np.abs(np.arccos(cos)))
                nrm = np.linalg.norm(last_t) * np.linalg.norm(t)
                diff_t = np.rad2deg(np.arccos(np.clip(
                    np.dot(last_t.ravel(), np.asarray(t).ravel()) / (nrm + 1e-15),
                    -1.0, 1.0)))
                pose_diff = max(diff_R, diff_t)
            else:
                pose_diff = np.inf
            last_R, last_t = R, t
            if self.with_uncertainty:
                # reference matching.py:243-257: pose-inlier-ratio-scaled
                # pooling threshold (mask semantics, no slicing)
                ir = float(np.sum(inliers)) / max(mids0.size, 1) \
                    if R is not None else 0.0
                mscore_th = self.mscore_base * ir if ir > 0 else self.mscore_base
                keep0, keep1 = self._pool(score, probs, keep0, keep1,
                                          jnp.asarray(mscore_th, jnp.float32))
            if pose_diff <= self.pose_stop_deg:
                out_idx = np.full_like(idx0_np, -1)
                sel = mids0[np.asarray(inliers, bool)]
                out_idx[sel] = idx0_np[sel]
                return {
                    "indices0": out_idx, "mscores0": ms0_np,
                    "R": R, "t": np.asarray(t).ravel(),
                    "has_pose": True, "stopped_at": ni + 1, "converged": True,
                }
        idx0f, _, ms0f, _ = model.compute_matches(
            score, p=0.2, valid0=keep0, valid1=keep1)
        # reference protocol: non-convergence returns NO pose
        # (matching.py:119-123 returns None, None) — the eval driver then
        # re-estimates from the final p=0.2 matches
        return {
            "indices0": np.asarray(idx0f[0]), "mscores0": np.asarray(ms0f[0]),
            "R": np.eye(3), "t": np.zeros(3),
            "has_pose": False,
            "stopped_at": n_layers, "converged": False,
        }


def matching_iterative_ondevice(model, params, data, key, *, norm_thresh,
                                match_ratio=0.1, min_kpts=25, pose_stop_deg=1.5,
                                num_hypotheses=1024, with_uncertainty=False,
                                mscore_base=0.2):
    """One-shot convenience wrapper (builds an IterativeMatcher per call —
    prefer holding an IterativeMatcher when evaluating many pairs)."""
    m = IterativeMatcher(model, params, norm_thresh=norm_thresh,
                         match_ratio=match_ratio, min_kpts=min_kpts,
                         pose_stop_deg=pose_stop_deg, num_hypotheses=num_hypotheses,
                         with_uncertainty=with_uncertainty, mscore_base=mscore_base)
    return m.run(data, key)


class BatchedIterativeMatcher(IterativeMatcher):
    """Multi-pair iterative eval: B pairs advance through the loop together;
    per-pair convergence masks freeze each pair's outputs at its own stopping
    iteration (reference semantics per pair, eval/matching.py:110-117), and
    the host reads back ONE scalar per checkpoint (all-converged) to break
    early. Converged pairs keep riding along until the whole batch stops —
    the batching win (shared programs, full-device utilization) dominates the
    straggler waste at eval batch sizes."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self._check_b = jax.jit(self._check_batched_impl)
        if self.with_uncertainty:
            self._pool_b = jax.jit(self._pool_batched_impl)

    # ------------------------------------------------------------- jit bodies
    def _check_batched_impl(self, ni, desc0, desc1, keep0, keep1, x0n, x1n,
                            state, keys, norm_threshs):
        """Batched convergence check. x0n/x1n [B,N,2]; keys [B,2] PRNG keys;
        norm_threshs [B]. state carries frozen per-pair results."""
        from impx.ransac.pose_solver import (estimate_pose_from_matches,
                                             prior_essential)

        model, params = self.model, self.params
        fw = jnp.stack([p["w"] for p in params["final_proj"]])
        fb = jnp.stack([p["b"] for p in params["final_proj"]])
        mdesc0 = jnp.einsum("bnc,cd->bnd", desc0, fw[ni]) + fb[ni]
        mdesc1 = jnp.einsum("bnc,cd->bnd", desc1, fw[ni]) + fb[ni]
        dist = jnp.einsum("bnd,bmd->bnm", mdesc0, mdesc1) / (
            model.config.descriptor_dim ** 0.5)
        score = model.compute_score(params, dist, keep0, keep1)
        idx0, idx1, ms0, ms1 = model.compute_matches(
            score, p=self.match_ratio, valid0=keep0, valid1=keep1)

        m_valid = idx0 > -1                                   # [B, N]
        n_matches = jnp.sum(m_valid, axis=1)                  # [B]

        # previous checkpoint's pose warm-starts LO (see iterative_fused.py)
        E_prev = jax.vmap(prior_essential)(state["R"], state["t"],
                                           state["has_pose"])
        pose = jax.vmap(
            lambda k, a, b, i0, ms, th, ei: estimate_pose_from_matches(
                k, a, b, i0, ms, th, num_hypotheses=self.num_hypotheses,
                sample_size=self.sample_size, E_init=ei)
        )(keys, x0n, x1n, idx0, ms0, norm_threshs, E_prev)

        enough = n_matches >= self.min_kpts                   # [B]
        pose_ok = pose["num_inliers"] >= 5
        diff = jax.vmap(_pose_diff_deg)(state["R"], state["t"],
                                        pose["R"], pose["t"])
        diff = jnp.where(state["has_pose"] & pose_ok & enough, diff, jnp.inf)
        newly = enough & (diff <= self.pose_stop_deg) & ~state["converged"]
        active = ~state["converged"]

        inlier_idx0 = jnp.where(m_valid & pose["inliers"], idx0, -1)

        upd = active & enough & pose_ok
        state = dict(state)
        state["R"] = jnp.where(upd[:, None, None], pose["R"], state["R"])
        state["t"] = jnp.where(upd[:, None], pose["t"], state["t"])
        state["has_pose"] = jnp.where(active, enough & pose_ok,
                                      state["has_pose"])
        # freeze: newly converged pairs keep pose-inlier matches; still-active
        # pairs track the latest raw matches (the fallback if never converged)
        state["indices0"] = jnp.where(
            newly[:, None], inlier_idx0,
            jnp.where(active[:, None], idx0, state["indices0"]))
        state["mscores0"] = jnp.where(active[:, None], ms0, state["mscores0"])
        state["stopped_at"] = jnp.where(newly, ni + 1, state["stopped_at"])
        state["converged"] = state["converged"] | newly
        inlier_ratio = jnp.where(
            n_matches > 0, pose["num_inliers"] / jnp.maximum(n_matches, 1), 0.0)
        return state, score, inlier_ratio, jnp.all(state["converged"])

    def _pool_batched_impl(self, score, probs, keep0, keep1, mscore_th, active):
        """Uncertainty pooling with per-pair thresholds; frozen pairs keep
        their masks."""
        p00, p11, p10, p01 = probs
        new0, new1 = self.model.pool_masks(
            score, p00, p01, p11, p10, keep0, keep1,
            mscore_th=mscore_th[:, None])
        return (jnp.where(active[:, None], new0, keep0),
                jnp.where(active[:, None], new1, keep1))

    # --------------------------------------------------------------- host loop
    def run_batch(self, data: dict[str, Any], key, norm_threshs) -> dict[str, Any]:
        """data: the standard feed batched [B, ...] plus x0n/x1n [B, N, 2];
        norm_threshs: [B] per-pair RANSAC thresholds. Returns per-pair dict
        arrays (indices0 [B,N], R [B,3,3], t, has_pose, stopped_at,
        converged)."""
        model = self.model
        n_layers = model.config.n_layers
        b, n = data["valid0"].shape

        desc0, desc1 = self._encode(data)
        keep0, keep1 = data["valid0"], data["valid1"]
        probs = (None, None, None, None)
        state = {
            "R": jnp.broadcast_to(jnp.eye(3), (b, 3, 3)),
            "t": jnp.zeros((b, 3)),
            "has_pose": jnp.zeros((b,), bool),
            "converged": jnp.zeros((b,), bool),
            "indices0": jnp.full((b, n), -1, jnp.int32),
            "mscores0": jnp.zeros((b, n), jnp.float32),
            "stopped_at": jnp.full((b,), n_layers, jnp.int32),
        }
        norm_threshs = jnp.asarray(norm_threshs, jnp.float32)
        score = None

        for ni in range(n_layers):
            desc0, desc1, probs = self._steps[ni](desc0, desc1, probs, keep0, keep1)
            if ni not in self.valid_its:
                continue
            key, sub = jax.random.split(key)
            keys = jax.random.split(sub, b)
            active = ~state["converged"]
            state, score, inlier_ratio, all_done = self._check_b(
                jnp.asarray(ni), desc0, desc1, keep0, keep1,
                data["x0n"], data["x1n"], state, keys, norm_threshs)
            if self.with_uncertainty:
                th = jnp.where(inlier_ratio > 0,
                               self.mscore_base * inlier_ratio, self.mscore_base)
                keep0, keep1 = self._pool_b(score, probs, keep0, keep1, th, active)
            if bool(all_done):  # the ONLY host sync: one scalar per checkpoint
                break

        # never-converged pairs fall back to matches at p=0.2 from the last
        # score (reference matching.py:119-123)
        if score is not None:
            idx0, _, ms0, _ = model.compute_matches(
                score, p=0.2, valid0=keep0, valid1=keep1)
            conv = state["converged"]
            state["indices0"] = jnp.where(conv[:, None], state["indices0"], idx0)
            state["mscores0"] = jnp.where(conv[:, None], state["mscores0"], ms0)
        return state
