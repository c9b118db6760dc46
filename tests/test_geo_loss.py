"""Geometry-supervised (_geo) training: the pose-consistency loss term.

The reference declares the hook (nets/loss.py:20 `with_pose`,
nets/loss.py:125-126 `compute_epipolar_loss_batch`) and ships trained `_geo`
weight variants (eval/eval_imp.py:275/316) but never wires the loss; impx
implements it: assignment probabilities weighted by the clamped all-pairs
epipolar error under the ground-truth pose.
"""
import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

from impx.data.megadepth import SyntheticMegadepth
from impx.geometry.epipolar import (epipolar_distance, normalize_by_intrinsics,
                                    pairwise_epipolar_distance)
from impx.models import MatcherConfig, GM, DGNNS, AdaGMN
from impx.models.loss import geo_loss, maybe_epipolar_matrix


def _batch(n=4, nfeat=48, dim=32, seed=0):
    ds = SyntheticMegadepth(num_pairs=n, nfeatures=nfeat, desc_dim=dim, seed=seed)
    samples = [ds[i] for i in range(n)]
    return {k: jnp.asarray(np.stack([s[k] for s in samples]).astype(np.float32))
            for k in samples[0] if isinstance(samples[0][k], np.ndarray)}


def test_pairwise_diagonal_matches_aligned_distance():
    rs = np.random.RandomState(0)
    x0 = jnp.asarray(rs.randn(2, 16, 2) * 0.3)
    x1 = jnp.asarray(rs.randn(2, 16, 2) * 0.3)
    E = jnp.asarray(rs.randn(2, 3, 3))
    full = pairwise_epipolar_distance(x0, x1, E)
    aligned = epipolar_distance(x0, x1, E)
    np.testing.assert_allclose(
        np.asarray(jnp.diagonal(full, axis1=1, axis2=2)), np.asarray(aligned),
        rtol=1e-5, atol=1e-7)


def test_true_matches_have_near_zero_epipolar_error():
    """Ground-truth correspondences of the synthetic scenes must sit on the
    epipolar lines of gt_E; mismatched pairs must not (sanity of conventions:
    E21 with x1^T E x0 = 0, megadepth.py E construction)."""
    batch = _batch(n=2, nfeat=64)
    epi = maybe_epipolar_matrix(batch, clamp=1e9)
    assert epi is not None
    gt = np.asarray(batch["matching_mask"][:, :-1, :-1])
    epi = np.asarray(epi)
    on_true = epi[gt > 0.5]
    off_true = epi[gt < 0.5]
    assert on_true.size > 10
    # true matches carry 0.5 px synthetic noise (~1e-3 normalized); random
    # pairs sit ~2 orders of magnitude further from the epipolar lines
    assert np.median(on_true) < 5e-3, np.median(on_true)
    assert np.median(off_true) > 20 * np.median(on_true)


def test_geo_loss_prefers_consistent_assignments():
    batch = _batch(n=2, nfeat=64)
    epi = maybe_epipolar_matrix(batch, clamp=0.05)
    gt = batch["matching_mask"]
    n = gt.shape[1] - 1
    # "perfect" score = the gt mask itself; "wrong" = a rolled assignment
    wrong = jnp.roll(gt[:, :-1, :-1], shift=7, axis=2)
    wrong = jnp.pad(wrong, ((0, 0), (0, 1), (0, 1)))
    good = float(geo_loss(gt, epi))
    bad = float(geo_loss(wrong, epi))
    assert good < bad * 0.25, (good, bad)


def test_geo_loss_ignores_invalid_cells():
    rs = np.random.RandomState(1)
    score = jnp.asarray(rs.rand(2, 9, 9), jnp.float32)
    epi = jnp.asarray(rs.rand(2, 8, 8), jnp.float32)
    v0 = jnp.asarray(rs.rand(2, 8) < 0.7)
    v1 = jnp.asarray(rs.rand(2, 8) < 0.7)
    # corrupting invalid cells of score/epi must not change the loss
    base = float(geo_loss(score, epi, v0, v1))
    pair = v0[:, :, None] & v1[:, None, :]
    score2 = score.at[:, :-1, :-1].set(
        jnp.where(pair, score[:, :-1, :-1], 1e6))
    poisoned = float(geo_loss(score2, epi, v0, v1))
    np.testing.assert_allclose(poisoned, base, rtol=1e-6)


def _geo_cfg(attn_impl="xla", **over):
    return MatcherConfig(descriptor_dim=32, keypoint_encoder=(16, 32),
                         n_layers=3, sinkhorn_iterations=10, norm_fn="in",
                         attn_impl=attn_impl, with_geo=True, geo_weight=50.0,
                         **over)


def test_forward_train_with_geo_all_models():
    batch = _batch()
    for cls in (GM, DGNNS, AdaGMN):
        model = cls(_geo_cfg())
        params = model.init(jax.random.PRNGKey(0))
        out = model.forward_train(params, batch, train=True)
        assert np.isfinite(float(out["loss"]))
        assert float(out["geo_loss"]) > 0
        # the total decomposes: loss = matching_loss + w * geo_loss
        np.testing.assert_allclose(
            float(out["loss"]),
            float(out["matching_loss"]) + 50.0 * float(out["geo_loss"]),
            rtol=1e-5)


def test_scan_path_geo_matches_unrolled():
    batch = _batch()
    m_xla = DGNNS(_geo_cfg("xla"))
    m_pl = DGNNS(_geo_cfg("pallas"))
    params = m_xla.init(jax.random.PRNGKey(0))
    out_xla = m_xla.forward_train(params, batch, train=True)
    out_pl = m_pl.forward_train(params, batch, train=True)
    np.testing.assert_allclose(float(out_pl["geo_loss"]),
                               float(out_xla["geo_loss"]), rtol=1e-4)
    np.testing.assert_allclose(float(out_pl["loss"]), float(out_xla["loss"]),
                               rtol=1e-4)
    g = jax.grad(lambda p: m_pl.forward_train(p, batch, train=True)["loss"])(params)
    assert all(np.isfinite(np.asarray(x)).all() for x in jax.tree.leaves(g))


def test_geo_training_reduces_geo_loss():
    """A few steps of geo-weighted training must push probability mass toward
    epipolar-consistent pairs (geo term decreases)."""
    from impx.train.step import (TrainHyperParams, make_train_step,
                                 make_optimizer, init_stats)

    model = DGNNS(_geo_cfg("pallas"))
    params = model.init(jax.random.PRNGKey(1))
    hp = TrainHyperParams(lr=5e-4, decay_iter=10_000)
    step = make_train_step(model, hp, donate=False)
    opt = make_optimizer(hp).init(params)
    batch = _batch(n=8, seed=3)
    geo = []
    for it in range(30):
        params, opt, m, _ = step(params, opt, jnp.asarray(it), batch, init_stats())
        geo.append(float(m["geo_loss"]))
    assert np.isfinite(geo).all()
    assert np.mean(geo[-5:]) < np.mean(geo[:5]), geo
