"""Scan-path training forward: loss/grad parity with the unrolled XLA path."""
import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

from impx.models import MatcherConfig, DGNNS
from impx.data.megadepth import SyntheticMegadepth


def _batch(n=4, nfeat=48, dim=32):
    ds = SyntheticMegadepth(num_pairs=n, nfeatures=nfeat, desc_dim=dim, seed=0)
    samples = [ds[i] for i in range(n)]
    return {k: jnp.asarray(np.stack([s[k] for s in samples]).astype(np.float32))
            for k in samples[0] if isinstance(samples[0][k], np.ndarray)}


def test_forward_train_scan_matches_unrolled():
    cfg_xla = MatcherConfig(descriptor_dim=32, keypoint_encoder=(16, 32), n_layers=3,
                            sinkhorn_iterations=10, norm_fn="in", attn_impl="xla")
    cfg_pl = dataclasses.replace(cfg_xla, attn_impl="pallas")
    m_xla, m_pl = DGNNS(cfg_xla), DGNNS(cfg_pl)
    params = m_xla.init(jax.random.PRNGKey(0))
    batch = _batch()

    out_xla = m_xla.forward_train(params, batch, train=True)
    out_pl = m_pl.forward_train(params, batch, train=True)
    np.testing.assert_allclose(float(out_pl["loss"]), float(out_xla["loss"]),
                               rtol=1e-4)
    np.testing.assert_allclose(float(out_pl["acc_corr"]), float(out_xla["acc_corr"]),
                               rtol=1e-5)

    g_xla = jax.grad(lambda p: m_xla.forward_train(p, batch, train=True)["loss"])(params)
    g_pl = jax.grad(lambda p: m_pl.forward_train(p, batch, train=True)["loss"])(params)
    lx = jax.tree.leaves(g_xla)
    lp = jax.tree.leaves(g_pl)
    assert len(lx) == len(lp)
    for a, b in zip(lx, lp):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=5e-3, atol=1e-5)


def test_train_remat_policies_identical():
    """train_remat changes what the backward pass stores, never the values:
    loss and grads must be identical across 'full' / 'dots' / 'none'."""
    base = MatcherConfig(descriptor_dim=32, keypoint_encoder=(16, 32), n_layers=3,
                         sinkhorn_iterations=10, norm_fn="in", attn_impl="pallas")
    batch = _batch()
    params = DGNNS(base).init(jax.random.PRNGKey(0))
    ref_loss, ref_grads = None, None
    for policy in ("full", "dots", "attn", "attn_head", "attn_dots", "none"):
        m = DGNNS(dataclasses.replace(base, train_remat=policy))
        loss, grads = jax.value_and_grad(
            lambda p: m.forward_train(p, batch, train=True)["loss"])(params)
        if ref_loss is None:
            ref_loss, ref_grads = loss, grads
            continue
        np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-6)
        for a, b in zip(jax.tree.leaves(ref_grads), jax.tree.leaves(grads)):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=1e-5, atol=1e-7)


def test_forward_train_scan_learns():
    from impx.train.step import (TrainHyperParams, make_train_step,
                                 make_optimizer, init_stats)

    cfg = MatcherConfig(descriptor_dim=32, keypoint_encoder=(16, 32), n_layers=2,
                        sinkhorn_iterations=10, norm_fn="in", attn_impl="pallas")
    model = DGNNS(cfg)
    params = model.init(jax.random.PRNGKey(1))
    hp = TrainHyperParams(lr=5e-4, decay_iter=10_000)
    step = make_train_step(model, hp, donate=False)
    opt = make_optimizer(hp).init(params)
    batch = _batch(n=8)
    losses = []
    for it in range(40):
        params, opt, m, _ = step(params, opt, jnp.asarray(it), batch, init_stats())
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.8, (losses[0], losses[-1])


def test_eimp_forward_train_scan_matches_unrolled():
    """AdaGMN training on the scan fast path == the unrolled masked XLA path
    (loss, accuracy averaged over all iterations, grads) — incl. the
    survivor-restricted GT and stop_gradient pooling."""
    from impx.models import AdaGMN

    cfg_xla = MatcherConfig(descriptor_dim=32, keypoint_encoder=(16, 32),
                            n_layers=5, sinkhorn_iterations=10, norm_fn="in",
                            attn_impl="xla", first_it_to_update=2,
                            n_min_tokens=8)
    cfg_pl = dataclasses.replace(cfg_xla, attn_impl="pallas")
    m_xla, m_pl = AdaGMN(cfg_xla), AdaGMN(cfg_pl)
    params = m_xla.init(jax.random.PRNGKey(0))
    batch = _batch()

    out_xla = m_xla.forward_train(params, batch, train=True)
    out_pl = m_pl.forward_train(params, batch, train=True)
    np.testing.assert_allclose(float(out_pl["loss"]), float(out_xla["loss"]),
                               rtol=1e-4)
    for k in ("acc_corr", "acc_incorr", "total_acc_corr"):
        np.testing.assert_allclose(float(out_pl[k]), float(out_xla[k]),
                                   rtol=1e-5, err_msg=k)
    np.testing.assert_array_equal(np.asarray(out_pl["matches0"]),
                                  np.asarray(out_xla["matches0"]))

    g_xla = jax.grad(lambda p: m_xla.forward_train(p, batch, train=True)["loss"])(params)
    g_pl = jax.grad(lambda p: m_pl.forward_train(p, batch, train=True)["loss"])(params)
    for a, b in zip(jax.tree.leaves(g_xla), jax.tree.leaves(g_pl)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-3, atol=1e-5)


def _adagmn(n_layers=6, train_compaction=(), nfeat=48, n_min_tokens=8,
            first_it=2):
    from impx.models import AdaGMN
    cfg = MatcherConfig(
        descriptor_dim=32, keypoint_encoder=(16, 32), n_layers=n_layers,
        sinkhorn_iterations=10, norm_fn="in", attn_impl="pallas",
        n_min_tokens=n_min_tokens, first_it_to_update=first_it,
        train_compaction=train_compaction)
    return AdaGMN(cfg)


def test_eimp_train_compaction_identity_exact():
    """A gather into a bucket of size n BEFORE any pooling has fired is an
    identity reorder, so the compacted trainer must reproduce the masked
    trainer exactly — loss, every metric, and every gradient — through all
    later pooling iterations (the segmentation/gt-gather/scatter machinery
    adds nothing numerically)."""
    nfeat = 48
    m_mask = _adagmn(nfeat=nfeat)
    m_comp = _adagmn(nfeat=nfeat, train_compaction=((1, nfeat),))
    params = m_mask.init(jax.random.PRNGKey(0))
    batch = _batch(nfeat=nfeat)

    out_m = m_mask.forward_train(params, batch, train=True)
    out_c = m_comp.forward_train(params, batch, train=True)
    np.testing.assert_allclose(float(out_c["loss"]), float(out_m["loss"]),
                               rtol=1e-6)
    for k in ("matching_loss", "acc_corr", "acc_incorr", "total_acc_corr"):
        np.testing.assert_allclose(float(out_c[k]), float(out_m[k]),
                                   rtol=1e-6, err_msg=k)
    np.testing.assert_array_equal(np.asarray(out_c["matches0"]),
                                  np.asarray(out_m["matches0"]))
    assert float(out_c["compaction_overflow0"]) == 0
    assert float(out_c["compaction_overflow1"]) == 0

    g_m = jax.grad(lambda p: m_mask.forward_train(p, batch, train=True)["loss"])(params)
    g_c = jax.grad(lambda p: m_comp.forward_train(p, batch, train=True)["loss"])(params)
    for a, b in zip(jax.tree.leaves(g_m), jax.tree.leaves(g_c)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-5, atol=1e-7)


def test_eimp_train_compaction_shrink_runs():
    """Real shrinking buckets: the compacted trainer must produce finite
    loss/grads, full-size original-indexing outputs, and report overflow as
    a number (the sliced semantics is a deliberate departure from the masked
    trainer, so no equality here)."""
    nfeat = 48
    m = _adagmn(nfeat=nfeat, train_compaction=((2, 24), (4, 16)),
                n_min_tokens=4)
    params = m.init(jax.random.PRNGKey(1))
    batch = _batch(nfeat=nfeat)

    out = m.forward_train(params, batch, train=True)
    assert np.isfinite(float(out["loss"]))
    assert out["matches0"].shape == (4, nfeat)
    assert out["matching_scores0"].shape == (4, nfeat)
    assert np.isfinite(float(out["compaction_overflow0"]))

    g = jax.grad(lambda p: m.forward_train(p, batch, train=True)["loss"])(params)
    for leaf in jax.tree.leaves(g):
        assert np.isfinite(np.asarray(leaf)).all()


def test_train_fused_matches_remat_path():
    """cfg.train_fused (custom-VJP fused layers) vs the jax.checkpoint scan
    path: the forward is the same op sequence (loss identical); the backward
    is hand-structured (saved-lse attention backward + jax.vjp over the shared
    head/tail subfunctions), so grads must agree to fp32 rounding."""
    base = MatcherConfig(descriptor_dim=32, keypoint_encoder=(16, 32),
                         n_layers=4, sinkhorn_iterations=10, norm_fn="in",
                         attn_impl="pallas")
    fused = dataclasses.replace(base, train_fused=True)
    m_base, m_fused = DGNNS(base), DGNNS(fused)
    params = m_base.init(jax.random.PRNGKey(0))
    batch = _batch()

    out_b = m_base.forward_train(params, batch, train=True)
    out_f = m_fused.forward_train(params, batch, train=True)
    np.testing.assert_allclose(float(out_f["loss"]), float(out_b["loss"]),
                               rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(out_f["matches0"]),
                                  np.asarray(out_b["matches0"]))

    g_b = jax.grad(lambda p: m_base.forward_train(p, batch, train=True)["loss"])(params)
    g_f = jax.grad(lambda p: m_fused.forward_train(p, batch, train=True)["loss"])(params)
    for a, b in zip(jax.tree.leaves(g_b), jax.tree.leaves(g_f)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-3, atol=1e-6)


def test_train_fused_learns():
    from impx.train.step import (TrainHyperParams, make_train_step,
                                 make_optimizer, init_stats)

    cfg = MatcherConfig(descriptor_dim=32, keypoint_encoder=(16, 32),
                        n_layers=2, sinkhorn_iterations=10, norm_fn="in",
                        attn_impl="pallas", train_fused=True)
    model = DGNNS(cfg)
    params = model.init(jax.random.PRNGKey(1))
    hp = TrainHyperParams(lr=5e-4, decay_iter=10_000)
    step = make_train_step(model, hp, donate=False)
    opt = make_optimizer(hp).init(params)
    batch = _batch(n=8)
    losses = []
    for it in range(40):
        params, opt, m, _ = step(params, opt, jnp.asarray(it), batch, init_stats())
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.8, (losses[0], losses[-1])


def test_train_supervision_last_only():
    """cfg.train_supervision='last' (SuperGlue-style, superglue.py:352-416):
    the loss must equal a head applied ONCE to the final descriptors — i.e.
    the 'all' objective's final-iteration term, reproduced here by a 1-layer
    sanity relation instead: remat and fused paths must agree bit-for-bit,
    grads must be finite, and at n_layers=1 'all' and 'last' coincide."""
    base = MatcherConfig(descriptor_dim=32, keypoint_encoder=(16, 32),
                         n_layers=3, sinkhorn_iterations=10, norm_fn="in",
                         attn_impl="pallas", train_supervision="last")
    batch = _batch()
    params = DGNNS(base).init(jax.random.PRNGKey(0))

    m_remat = DGNNS(dataclasses.replace(base, train_remat="attn"))
    m_fused = DGNNS(dataclasses.replace(base, train_fused=True))
    out_r = m_remat.forward_train(params, batch, train=True)
    out_f = m_fused.forward_train(params, batch, train=True)
    np.testing.assert_allclose(float(out_f["loss"]), float(out_r["loss"]),
                               rtol=1e-6)
    g = jax.grad(
        lambda p: m_fused.forward_train(p, batch, train=True)["loss"])(params)
    assert all(np.isfinite(np.asarray(x)).all() for x in jax.tree.leaves(g))

    # at n_layers=1 the two supervision modes are the same objective
    one = dataclasses.replace(base, n_layers=1)
    p1 = DGNNS(one).init(jax.random.PRNGKey(1))
    l_last = float(DGNNS(one).forward_train(p1, batch, train=True)["loss"])
    l_all = float(DGNNS(dataclasses.replace(one, train_supervision="all"))
                  .forward_train(p1, batch, train=True)["loss"])
    np.testing.assert_allclose(l_last, l_all, rtol=1e-6)

    import pytest
    with pytest.raises(ValueError):
        DGNNS(dataclasses.replace(base, train_supervision="bogus")).forward_train(
            params, batch, train=True)
