"""Fused LOG-domain Sinkhorn kernel (impx/ops/pallas/log_sinkhorn.py) vs the
XLA path (impx/ops/sinkhorn.py:log_optimal_transport, itself parity-tested
against the torch reference nets/superglue.py:180-209 in test_superglue.py) —
plus a direct torch-reference chain and the remat VJP."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from impx.ops.sinkhorn import log_optimal_transport
from impx.ops.pallas.log_sinkhorn import (
    log_sinkhorn_fused_stats, log_plan_from_uv, log_optimal_transport_fused)


def _case(b, n, m, n0, n1, seed=0):
    rs = np.random.RandomState(seed)
    dist = jnp.asarray(rs.randn(b, n, m) * 2, jnp.float32)
    valid0 = jnp.asarray(np.arange(n)[None] < np.asarray(n0)[:, None])
    valid1 = jnp.asarray(np.arange(m)[None] < np.asarray(n1)[:, None])
    return dist, jnp.asarray(0.7, jnp.float32), valid0, valid1


@pytest.mark.parametrize("n,m,n0,n1,iters", [
    (256, 256, [200, 256], [180, 256], 20),   # masked + full
    (256, 128, [256, 100], [128, 90], 20),    # rectangular
    (512, 512, [30, 512], [25, 512], 50),     # heavily masked, deep iteration
])
def test_fused_log_plan_equals_xla(n, m, n0, n1, iters):
    dist, bin_, valid0, valid1 = _case(2, n, m, n0, n1)
    ref = log_optimal_transport(dist, bin_, iters, valid0, valid1)

    stats = log_sinkhorn_fused_stats(dist, bin_, iters, valid0, valid1,
                                     interpret=True)
    plan = log_plan_from_uv(dist, bin_, stats["u"], stats["v"], valid0, valid1)
    ok = (np.asarray(valid0)[:, :, None] & np.asarray(valid1)[:, None, :])
    ok = np.pad(ok, ((0, 0), (0, 1), (0, 1)), constant_values=True)
    np.testing.assert_allclose(np.asarray(plan)[ok], np.asarray(ref)[ok],
                               rtol=1e-4, atol=1e-5)


def test_fused_log_stats_match_xla_argmax():
    """max0/idx0/idx1 must reproduce SuperGlue's match extraction source:
    the row/col max+argmax of the log-plan interior
    (reference superglue.py:424-428; exp is monotonic)."""
    dist, bin_, valid0, valid1 = _case(2, 256, 256, [200, 256], [180, 256],
                                       seed=3)
    ref = np.asarray(log_optimal_transport(dist, bin_, 20, valid0, valid1))
    stats = log_sinkhorn_fused_stats(dist, bin_, 20, valid0, valid1,
                                     interpret=True)
    v0 = np.asarray(valid0)
    v1 = np.asarray(valid1)
    inner = np.where(v0[:, :, None] & v1[:, None, :], ref[:, :-1, :-1], -1e30)
    np.testing.assert_array_equal(inner.argmax(2)[v0],
                                  np.asarray(stats["idx0"])[v0])
    np.testing.assert_array_equal(inner.argmax(1)[v1],
                                  np.asarray(stats["idx1"])[v1])
    np.testing.assert_allclose(inner.max(2)[v0], np.asarray(stats["max0"])[v0],
                               rtol=1e-4, atol=1e-5)


def test_fused_log_drop_in_and_vjp():
    """log_optimal_transport_fused: forward == XLA at valid cells, and the
    remat custom VJP == the XLA path's gradient."""
    dist, bin_, valid0, valid1 = _case(1, 128, 128, [100], [90], seed=7)

    def loss_xla(d, b):
        out = log_optimal_transport(d, b, 10, valid0, valid1)
        return jnp.sum(out[:, :100, :90] ** 2)

    def loss_fused(d, b):
        out = log_optimal_transport_fused(d, b, 10, valid0, valid1,
                                          128, True)
        return jnp.sum(out[:, :100, :90] ** 2)

    (l0, g0) = jax.value_and_grad(loss_xla, argnums=(0, 1))(dist, bin_)
    (l1, g1) = jax.value_and_grad(loss_fused, argnums=(0, 1))(dist, bin_)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(g0[0]), np.asarray(g1[0]),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(float(g0[1]), float(g1[1]), rtol=1e-4)


def test_log_ot_model_head_fast_path_agrees_with_xla():
    """config.log_ot=True swaps the flagship's score head to log-domain OT:
    the pallas scan fast path (fused logsumexp kernel) must produce the same
    matches/log-scores as the XLA path, and training must return a finite
    loss through the remat VJP."""
    import dataclasses

    from impx.models import MatcherConfig, DGNNS

    cfg = MatcherConfig(descriptor_dim=64, keypoint_encoder=(32, 64),
                        n_layers=3, sinkhorn_iterations=10, norm_fn="in",
                        ac_fn="relu", log_ot=True)
    model_x = DGNNS(cfg)
    model_f = DGNNS(dataclasses.replace(cfg, attn_impl="pallas"))
    params = model_x.init(jax.random.PRNGKey(0))

    rs = np.random.RandomState(3)
    b, n = 2, 64
    data = {
        "descriptors0": jnp.asarray(rs.randn(b, n, 64), jnp.float32),
        "descriptors1": jnp.asarray(rs.randn(b, n, 64), jnp.float32),
        "norm_keypoints0": jnp.asarray(rs.rand(b, n, 2) - 0.5, jnp.float32),
        "norm_keypoints1": jnp.asarray(rs.rand(b, n, 2) - 0.5, jnp.float32),
        "scores0": jnp.asarray(rs.rand(b, n), jnp.float32),
        "scores1": jnp.asarray(rs.rand(b, n), jnp.float32),
    }
    out_x = model_x.produce_matches(params, data, p=0.2, only_last=True)
    out_f = model_f.produce_matches(params, data, p=0.2, only_last=True)
    np.testing.assert_array_equal(np.asarray(out_x["indices0"][-1]),
                                  np.asarray(out_f["indices0"][-1]))
    np.testing.assert_allclose(np.asarray(out_x["mscores0"][-1]),
                               np.asarray(out_f["mscores0"][-1]), atol=1e-4)
    # scores are LOG plans on both paths
    np.testing.assert_allclose(np.asarray(out_x["scores"][-1]),
                               np.asarray(out_f["scores"][-1]),
                               rtol=1e-3, atol=1e-3)
    # log-domain, not probabilities: a prob plan is >= 0 everywhere, a log
    # plan is overwhelmingly negative (values are log((M+N)·p))
    assert float(jnp.min(out_x["scores"][-1])) < -1.0

    # training: finite loss + finite grads through the fused head's remat VJP
    half = n // 2
    gt = np.zeros((b, n + 1, n + 1), np.float32)
    gt[:, np.arange(half), np.arange(half)] = 1
    gt[:, np.arange(half, n), -1] = 1
    gt[:, -1, np.arange(half, n)] = 1
    tdata = dict(data, matching_mask=jnp.asarray(gt))

    def loss_fn(p, model):
        return model.forward_train(p, tdata, train=False)["loss"]

    l_x, g_x = jax.value_and_grad(loss_fn)(params, model_x)
    l_f, g_f = jax.value_and_grad(loss_fn)(params, model_f)
    assert np.isfinite(float(l_x)) and np.isfinite(float(l_f))
    np.testing.assert_allclose(float(l_x), float(l_f), rtol=1e-3)
    for a, bb in zip(jax.tree.leaves(g_x), jax.tree.leaves(g_f)):
        assert np.isfinite(np.asarray(a)).all()
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                   rtol=5e-2, atol=5e-4)


def test_fused_log_matches_torch_reference(reference_path):
    """Direct chain to the reference: kernel log-plan == torch
    nets/superglue.py:189-209 log_optimal_transport (unmasked, its only
    mode)."""
    import torch
    from nets.superglue import log_optimal_transport as torch_lot

    rs = np.random.RandomState(11)
    scores = rs.randn(2, 96, 80).astype(np.float32) * 2
    bin_score = 1.3

    with torch.no_grad():
        ref = torch_lot(torch.from_numpy(scores),
                        torch.nn.Parameter(torch.tensor(bin_score)),
                        iters=30).numpy()

    stats = log_sinkhorn_fused_stats(
        jnp.asarray(scores), jnp.asarray(bin_score, jnp.float32), 30,
        block_rows=32, interpret=True)
    plan = log_plan_from_uv(jnp.asarray(scores),
                            jnp.asarray(bin_score, jnp.float32),
                            stats["u"], stats["v"])
    np.testing.assert_allclose(np.asarray(plan), ref, rtol=1e-4, atol=1e-5)
