"""Crown end-to-end test: train a small matcher on synthetic scenes, then run
the full iterative match<->pose loop — the trained model must recover the true
relative pose and early-stop once the pose converges."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from impx.models import MatcherConfig, DGNNS
from impx.data.synthetic import synthesize_pair
from impx.data.megadepth import SyntheticMegadepth
from impx.train.step import (TrainHyperParams, make_train_step, make_optimizer,
                             init_stats)
from impx.eval.iterative import IterativeMatcher
from impx import geometry as G

N_KPTS = 128
DIM = 32


@pytest.fixture(scope="module")
def trained_model():
    cfg = MatcherConfig(descriptor_dim=DIM, keypoint_encoder=(16, 32), n_layers=6,
                        sinkhorn_iterations=10, norm_fn="in", n_min_tokens=16)
    model = DGNNS(cfg)
    params = model.init(jax.random.PRNGKey(0))
    hp = TrainHyperParams(lr=5e-4, decay_iter=10_000)
    step = make_train_step(model, hp, donate=False)
    opt_state = make_optimizer(hp).init(params)

    # rotate fresh batches so the matcher generalizes instead of memorizing
    ds = SyntheticMegadepth(num_pairs=96, nfeatures=N_KPTS, desc_dim=DIM, seed=0)
    batches = []
    for b in range(6):
        samples = [ds[b * 16 + i] for i in range(16)]
        batches.append({k: jnp.asarray(np.stack([s[k] for s in samples]).astype(np.float32))
                        for k in samples[0] if isinstance(samples[0][k], np.ndarray)})
    for it in range(300):
        params, opt_state, metrics, _ = step(params, opt_state, jnp.asarray(it),
                                             batches[it % len(batches)], init_stats())
    assert float(metrics["acc_corr"]) > 20, float(metrics["acc_corr"])
    return model, params


def _pad(a, n):
    return np.pad(a, [(0, n - a.shape[0])] + [(0, 0)] * (a.ndim - 1))


def _pair_feed(rs):
    pair = synthesize_pair(rs, n_inliers=80, n_outliers0=48, n_outliers1=48,
                           desc_dim=DIM, image_size=(480, 640))
    n0 = min(len(pair["kpt1"]), N_KPTS)
    n1 = min(len(pair["kpt2"]), N_KPTS)
    k0 = _pad(pair["kpt1"][:n0], N_KPTS)
    k1 = _pad(pair["kpt2"][:n1], N_KPTS)
    valid0 = np.arange(N_KPTS) < n0
    valid1 = np.arange(N_KPTS) < n1
    h, w = pair["img_size1"]
    size = np.array([w, h], np.float32)
    norm0 = (k0[:, :2] - size / 2 - 0.5) / (size.max() * 0.7)
    norm1 = (k1[:, :2] - size / 2 - 0.5) / (size.max() * 0.7)
    K = pair["K1"]
    x0n = (k0[:, :2] - K[:2, 2]) / np.array([K[0, 0], K[1, 1]])
    x1n = (k1[:, :2] - K[:2, 2]) / np.array([K[0, 0], K[1, 1]])
    feed = {
        "descriptors0": jnp.asarray(_pad(pair["desc1"][:n0], N_KPTS))[None],
        "descriptors1": jnp.asarray(_pad(pair["desc2"][:n1], N_KPTS))[None],
        "norm_keypoints0": jnp.asarray(norm0)[None],
        "norm_keypoints1": jnp.asarray(norm1)[None],
        "scores0": jnp.asarray(k0[:, 2])[None],
        "scores1": jnp.asarray(k1[:, 2])[None],
        "valid0": jnp.asarray(valid0)[None],
        "valid1": jnp.asarray(valid1)[None],
        "x0n": jnp.asarray(x0n),
        "x1n": jnp.asarray(x1n),
    }
    return feed, pair


def test_iterative_recovers_pose_and_early_stops(trained_model):
    model, params = trained_model
    matcher = IterativeMatcher(
        model, params, norm_thresh=2e-3, match_ratio=0.1, min_kpts=15,
        pose_stop_deg=2.5, num_hypotheses=512, valid_its=(1, 2, 3, 4, 5))

    rs = np.random.RandomState(100)
    n_pairs = 6
    n_converged = 0
    errs = []
    stops = []
    key = jax.random.PRNGKey(0)
    for i in range(n_pairs):
        feed, pair = _pair_feed(rs)
        key, sub = jax.random.split(key)
        out = matcher.run(feed, sub)
        if bool(out["converged"]):
            n_converged += 1
            stops.append(int(out["stopped_at"]))
            err_R = float(G.angle_error_mat(jnp.asarray(pair["R"]), jnp.asarray(out["R"])))
            err_t = float(G.angle_error_vec(jnp.asarray(pair["T"]), jnp.asarray(out["t"])))
            err_t = min(err_t, 180 - err_t)
            errs.append(max(err_R, err_t))
    assert n_converged >= 4, f"only {n_converged}/{n_pairs} pairs converged"
    assert np.median(errs) < 5.0, errs
    assert min(stops) < model.config.n_layers, stops  # early exit actually fired


def test_produce_matches_on_trained_model(trained_model):
    """Non-iterative path: the trained matcher's precision against GT E."""
    model, params = trained_model
    rs = np.random.RandomState(200)
    feed, pair = _pair_feed(rs)
    out = model.produce_matches(params, feed, p=0.2, only_last=True)
    idx0 = np.asarray(out["indices0"][-1][0])
    valid = idx0 > -1
    assert valid.sum() >= 20
    x0n = np.asarray(feed["x0n"])[valid]
    x1n = np.asarray(feed["x1n"])[np.clip(idx0[valid], 0, N_KPTS - 1)]
    inl = np.asarray(G.compute_epi_inlier(
        jnp.asarray(x0n), jnp.asarray(x1n), jnp.asarray(pair["e"]), 0.01))
    assert inl.mean() > 0.7, inl.mean()


def test_batched_iterative_recovers_poses(trained_model):
    """BatchedIterativeMatcher: 4 pairs per program, per-pair convergence
    freezing; trained model must recover each pair's pose."""
    from impx.eval.iterative import BatchedIterativeMatcher

    model, params = trained_model
    rs = np.random.RandomState(100)  # same pair stream the per-pair test uses
    feeds, pairs = zip(*[_pair_feed(rs) for _ in range(4)])
    batch = {k: jnp.concatenate([f[k] for f in feeds], axis=0)
             for k in feeds[0] if k not in ("x0n", "x1n")}
    batch["x0n"] = jnp.stack([f["x0n"] for f in feeds])
    batch["x1n"] = jnp.stack([f["x1n"] for f in feeds])

    matcher = BatchedIterativeMatcher(
        model, params, norm_thresh=2e-3, match_ratio=0.1, min_kpts=15,
        pose_stop_deg=2.5, num_hypotheses=512, valid_its=(1, 2, 3, 4, 5))
    out = matcher.run_batch(batch, jax.random.PRNGKey(1),
                            np.full(4, 2e-3, np.float32))
    conv = np.asarray(out["converged"])
    stops = np.asarray(out["stopped_at"])
    assert conv.sum() >= 3, conv
    errs = []
    for bi in range(4):
        if not conv[bi]:
            continue
        err_R = float(G.angle_error_mat(jnp.asarray(pairs[bi]["R"]),
                                        jnp.asarray(out["R"][bi])))
        err_t = float(G.angle_error_vec(jnp.asarray(pairs[bi]["T"]),
                                        jnp.asarray(out["t"][bi])))
        err_t = min(err_t, 180 - err_t)
        errs.append(max(err_R, err_t))
        # converged pairs report their own stopping iteration
        assert stops[bi] <= model.config.n_layers
    assert np.median(errs) < 5.0, errs
    assert (stops[conv] < model.config.n_layers).any(), stops


def test_fused_iterative_single_program(trained_model):
    """Fully-fused single-program loop (impx/eval/iterative_fused.py):
    same pairs, zero host round-trips, per-pair convergence masks."""
    from impx.eval.iterative_fused import run_iterative_fused

    model, params = trained_model
    rs = np.random.RandomState(100)
    feeds, pairs = zip(*[_pair_feed(rs) for _ in range(4)])
    batch = {k: jnp.concatenate([f[k] for f in feeds], axis=0)
             for k in feeds[0] if k not in ("x0n", "x1n")}
    batch["x0n"] = jnp.stack([f["x0n"] for f in feeds])
    batch["x1n"] = jnp.stack([f["x1n"] for f in feeds])

    out = run_iterative_fused(
        model, params, batch, jax.random.PRNGKey(1),
        np.full(4, 2e-3, np.float32), valid_its=(1, 2, 3, 4, 5),
        match_ratio=0.1, min_kpts=15, pose_stop_deg=2.5, num_hypotheses=512)
    conv = np.asarray(out["converged"])
    assert conv.sum() >= 3, conv
    errs = []
    for bi in range(4):
        if not conv[bi]:
            continue
        err_R = float(G.angle_error_mat(jnp.asarray(pairs[bi]["R"]),
                                        jnp.asarray(out["R"][bi])))
        errs.append(err_R)
    assert np.median(errs) < 5.0, errs
    stops = np.asarray(out["stopped_at"])
    assert (stops[conv] < model.config.n_layers).any(), stops


def test_cv2_checkpoint_backend(trained_model):
    """checkpoint_backend="cv2": host USAC_MAGSAC at every checkpoint inside
    impx's loop — the reference's exact checkpoint solver (eval/matching.py:
    84-87), used by cross_study to isolate matcher-vs-backend divergence.
    Must converge and recover poses like the jax backend does."""
    pytest.importorskip("cv2")
    model, params = trained_model
    matcher = IterativeMatcher(
        model, params, norm_thresh=2e-3, match_ratio=0.1, min_kpts=15,
        pose_stop_deg=2.5, valid_its=(1, 2, 3, 4, 5),
        checkpoint_backend="cv2")

    rs = np.random.RandomState(100)  # same pair stream as the jax-backend test
    n_converged, errs, stops = 0, [], []
    key = jax.random.PRNGKey(0)
    for _ in range(6):
        feed, pair = _pair_feed(rs)
        key, sub = jax.random.split(key)
        out = matcher.run(feed, sub)
        assert out["indices0"].shape == (N_KPTS,)
        if bool(out["converged"]):
            n_converged += 1
            stops.append(int(out["stopped_at"]))
            err_R = float(G.angle_error_mat(jnp.asarray(pair["R"]),
                                            jnp.asarray(out["R"])))
            err_t = float(G.angle_error_vec(jnp.asarray(pair["T"]),
                                            jnp.asarray(out["t"])))
            err_t = min(err_t, 180 - err_t)
            errs.append(max(err_R, err_t))
            # converged output keeps only pose-inlier matches
            assert (np.asarray(out["indices0"]) > -1).sum() >= 15
    assert n_converged >= 4, f"only {n_converged}/6 pairs converged"
    assert np.median(errs) < 5.0, errs
    assert min(stops) < model.config.n_layers, stops


def _queue_feed(rs, n_pairs):
    feeds, pairs = zip(*[_pair_feed(rs) for _ in range(n_pairs)])
    queue = {k: jnp.concatenate([f[k] for f in feeds], axis=0)
             for k in feeds[0] if k not in ("x0n", "x1n")}
    queue["x0n"] = jnp.stack([f["x0n"] for f in feeds])
    queue["x1n"] = jnp.stack([f["x1n"] for f in feeds])
    queue["norm_threshs"] = jnp.full((n_pairs,), 2e-3, jnp.float32)
    return queue, pairs


def _permuted(queue, perm):
    """Reorder the queue; each pair keeps its ORIGINAL identity via pair_ids,
    so its RANSAC key — fold_in(key, pair_id) — travels with it."""
    q = {k: v[jnp.asarray(perm)] for k, v in queue.items()}
    q["pair_ids"] = jnp.asarray(perm, jnp.int32)
    return q


def _unpermute(out, perm):
    inv = np.empty_like(perm)
    inv[perm] = np.arange(len(perm))
    return {k: np.asarray(v)[inv] if np.asarray(v).ndim else np.asarray(v)
            for k, v in out.items()}


def _assert_agreement(out_a, out_b, q, max_flips=1, atol=1e-4,
                      check_indices=True):
    """Cross-SHAPE comparison (different slot/cohort counts compile different
    XLA programs whose fp rounding can flip a pair sitting exactly at the
    pose-diff stop threshold — observed under the 8-virtual-device CPU
    runtime). Scheduling bugs corrupt many pairs; tolerate at most
    `max_flips` threshold-adjacent convergence flips and require jointly
    converged pairs to agree exactly."""
    conv_a = np.asarray(out_a["converged"])
    conv_b = np.asarray(out_b["converged"])
    flips = conv_a != conv_b
    assert flips.sum() <= max_flips, (conv_a, conv_b)
    both = conv_a & conv_b & ~flips
    same_stop = np.asarray(out_a["stopped_at"])[both] == \
        np.asarray(out_b["stopped_at"])[both]
    assert same_stop.all()
    if check_indices:
        np.testing.assert_array_equal(np.asarray(out_a["indices0"])[both],
                                      np.asarray(out_b["indices0"])[both])
    np.testing.assert_allclose(np.asarray(out_a["R"])[both],
                               np.asarray(out_b["R"])[both], atol=atol)
    np.testing.assert_allclose(np.asarray(out_a["t"])[both],
                               np.asarray(out_b["t"])[both], atol=atol)


def test_refill_scheduling_invariance(trained_model):
    """Scheduling must not leak into per-pair results. Pinned two ways:
    (a) BITWISE queue-order invariance at fixed shapes — permuting the queue
    (pair_ids carrying each pair's RANSAC identity) permutes every output
    exactly; (b) agreement across slot counts, which compile different XLA
    programs (see _assert_agreement)."""
    from impx.eval.iterative_refill import run_iterative_refill

    model, params = trained_model
    rs = np.random.RandomState(300)
    queue, pairs = _queue_feed(rs, 6)
    kw = dict(valid_its=(1, 2, 3, 4, 5), match_ratio=0.1, min_kpts=15,
              pose_stop_deg=2.5, num_hypotheses=256)
    key = jax.random.PRNGKey(7)
    out_a = run_iterative_refill(model, params, queue, key, slots=3, **kw)
    assert int(out_a["completed"]) == 6

    perm = np.array([4, 0, 5, 2, 1, 3])
    out_p = run_iterative_refill(model, params, _permuted(queue, perm), key,
                                 slots=3, **kw)
    out_p = _unpermute(out_p, perm)
    for k in ("converged", "stopped_at", "indices0", "mscores0", "R", "t"):
        np.testing.assert_array_equal(np.asarray(out_a[k]), out_p[k], err_msg=k)

    out_b = run_iterative_refill(model, params, queue, key, slots=6, **kw)
    assert int(out_b["completed"]) == 6
    _assert_agreement(out_a, out_b, queue)


def test_staged_scheduling_invariance(trained_model):
    """Cohort composition must not leak into per-pair results. Pinned two
    ways, like the refill test: (a) BITWISE queue-order invariance at fixed
    shapes; (b) agreement across cohort sizes (different XLA programs)."""
    from impx.eval.iterative_staged import run_iterative_staged

    model, params = trained_model
    rs = np.random.RandomState(300)
    queue, pairs = _queue_feed(rs, 6)
    kw = dict(valid_its=(1, 2, 3, 4, 5), match_ratio=0.1, min_kpts=15,
              pose_stop_deg=2.5, num_hypotheses=256)
    key = jax.random.PRNGKey(7)
    out_a = run_iterative_staged(model, params, queue, key, batch=3, **kw)
    assert int(out_a["completed"]) == 6

    perm = np.array([4, 0, 5, 2, 1, 3])
    out_p = run_iterative_staged(model, params, _permuted(queue, perm), key,
                                 batch=3, **kw)
    out_p = _unpermute(out_p, perm)
    for k in ("converged", "stopped_at", "indices0", "mscores0", "R", "t"):
        np.testing.assert_array_equal(np.asarray(out_a[k]), out_p[k], err_msg=k)

    out_b = run_iterative_staged(model, params, queue, key, batch=6, **kw)
    assert int(out_b["completed"]) == 6
    _assert_agreement(out_a, out_b, queue)
    # the refill loop uses the same per-pair-identity key discipline, so the
    # two schedulers should agree pair for pair — up to fp: refill's layers
    # run with per-slot GATHERED weight operands (einsum bnd,bde->bne) where
    # staged closes over constant weights (bnd,de->bne), a different XLA
    # program (see _assert_agreement).
    from impx.eval.iterative_refill import run_iterative_refill

    out_r = run_iterative_refill(model, params, queue, key, slots=3, **kw)
    _assert_agreement(out_a, out_r, queue, atol=1e-3, check_indices=False)


def test_staged_recovers_poses(trained_model):
    """Quality gate: the staged cohort loop on a trained model must converge
    and recover the true relative poses (same bar as the other loops)."""
    from impx.eval.iterative_staged import run_iterative_staged

    model, params = trained_model
    rs = np.random.RandomState(100)  # same pair stream as the other tests
    queue, pairs = _queue_feed(rs, 6)
    out = run_iterative_staged(
        model, params, queue, jax.random.PRNGKey(1), batch=3,
        valid_its=(1, 2, 3, 4, 5), match_ratio=0.1, min_kpts=15,
        pose_stop_deg=2.5, num_hypotheses=512)
    conv = np.asarray(out["converged"])
    assert conv.sum() >= 4, conv
    errs = []
    for qi in range(6):
        if not conv[qi]:
            continue
        err_R = float(G.angle_error_mat(jnp.asarray(pairs[qi]["R"]),
                                        jnp.asarray(out["R"][qi])))
        err_t = float(G.angle_error_vec(jnp.asarray(pairs[qi]["T"]),
                                        jnp.asarray(out["t"][qi])))
        errs.append(max(err_R, min(err_t, 180 - err_t)))
    assert np.median(errs) < 5.0, errs
    assert (np.asarray(out["stopped_at"])[conv] < model.config.n_layers).any()


def test_refill_recovers_poses(trained_model):
    """Quality gate: the refill loop on a trained model must converge and
    recover the true relative poses (same bar as the lockstep loops)."""
    from impx.eval.iterative_refill import run_iterative_refill

    model, params = trained_model
    rs = np.random.RandomState(100)  # same pair stream as the other tests
    queue, pairs = _queue_feed(rs, 6)
    out = run_iterative_refill(
        model, params, queue, jax.random.PRNGKey(1), slots=3,
        valid_its=(1, 2, 3, 4, 5), match_ratio=0.1, min_kpts=15,
        pose_stop_deg=2.5, num_hypotheses=512)
    conv = np.asarray(out["converged"])
    assert conv.sum() >= 4, conv
    errs = []
    for qi in range(6):
        if not conv[qi]:
            continue
        err_R = float(G.angle_error_mat(jnp.asarray(pairs[qi]["R"]),
                                        jnp.asarray(out["R"][qi])))
        err_t = float(G.angle_error_vec(jnp.asarray(pairs[qi]["T"]),
                                        jnp.asarray(out["t"][qi])))
        errs.append(max(err_R, min(err_t, 180 - err_t)))
    assert np.median(errs) < 5.0, errs
    assert (np.asarray(out["stopped_at"])[conv] < model.config.n_layers).any()
