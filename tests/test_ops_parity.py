"""Elementwise parity of impx core ops against the reference PyTorch modules
(random weights, CPU). These anchor the numerics of everything downstream."""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from impx.ops import mlp as mlp_ops
from impx.ops.attention import multi_head_attention, attention_from_prob
from impx.ops.sinkhorn import sink_algorithm, dual_softmax
from impx.ops.matching import compute_matches
from impx.tools.convert_torch import _mlp as convert_mlp, _conv1d

RTOL, ATOL = 1e-5, 1e-5


def torch_sink_algorithm(M, dustbin, iteration):
    """Device-agnostic restatement of the reference non-log Sinkhorn
    (nets/layers.py:27-46, which hardcodes device='cuda')."""
    eps = 1e-8
    M = torch.cat([M, dustbin.expand([M.shape[0], M.shape[1], 1])], dim=-1)
    M = torch.cat([M, dustbin.expand([M.shape[0], 1, M.shape[2]])], dim=-2)
    r = torch.ones([M.shape[0], M.shape[1] - 1])
    r = torch.cat([r, torch.ones([M.shape[0], 1]) * M.shape[1]], dim=-1)
    c = torch.ones([M.shape[0], M.shape[2] - 1])
    c = torch.cat([c, torch.ones([M.shape[0], 1]) * M.shape[2]], dim=-1)
    p = torch.softmax(M, dim=-1)
    u = torch.ones_like(r)
    v = torch.ones_like(c)
    for _ in range(iteration):
        u = r / ((p * v.unsqueeze(-2)).sum(-1) + eps)
        v = c / ((p * u.unsqueeze(-1)).sum(-2) + eps)
    return p * u.unsqueeze(-1) * v.unsqueeze(-2)


@pytest.mark.parametrize("norm_fn", ["in", "bn"])
def test_mlp_parity(reference_path, norm_fn):
    from nets.layers import MLP

    torch.manual_seed(0)
    channels = [3, 32, 64, 16]
    tm = MLP(channels, ac_fn="relu", norm_fn=norm_fn).eval()
    # randomize BN running stats so eval-mode conversion is actually exercised
    for m in tm.modules():
        if isinstance(m, torch.nn.BatchNorm1d):
            m.running_mean.uniform_(-1, 1)
            m.running_var.uniform_(0.5, 2.0)

    blocks = convert_mlp(tm.state_dict(), "", len(channels) - 1, norm_fn)
    x = np.random.RandomState(1).randn(2, 40, 3).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x).transpose(1, 2)).transpose(1, 2).numpy()
    out, _ = mlp_ops.mlp_apply(blocks, jnp.asarray(x), norm_fn=norm_fn, ac_fn="relu")
    np.testing.assert_allclose(np.asarray(out), ref, rtol=RTOL, atol=ATOL)


def test_attention_parity(reference_path):
    from nets.layers import MultiHeadedAttention

    torch.manual_seed(0)
    d = 64
    tm = MultiHeadedAttention(num_heads=4, d_model=d).eval()
    sd = tm.state_dict()
    params = {
        "q": _conv1d(sd, "proj.0"),
        "k": _conv1d(sd, "proj.1"),
        "v": _conv1d(sd, "proj.2"),
        "merge": _conv1d(sd, "merge"),
    }
    rs = np.random.RandomState(2)
    x = rs.randn(2, 30, d).astype(np.float32)
    src = rs.randn(2, 40, d).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x).transpose(1, 2), torch.from_numpy(src).transpose(1, 2),
                 torch.from_numpy(src).transpose(1, 2))
        ref_out = ref.transpose(1, 2).numpy()
        ref_prob = tm.prob.numpy()
    out, prob = multi_head_attention(params, jnp.asarray(x), jnp.asarray(src), num_heads=4)
    np.testing.assert_allclose(np.asarray(out), ref_out, rtol=RTOL, atol=ATOL)
    np.testing.assert_allclose(np.asarray(prob), ref_prob, rtol=RTOL, atol=ATOL)

    # masked attention == attention on the compacted source
    key_mask = np.zeros((2, 40), bool)
    key_mask[:, :25] = True
    out_m, prob_m = multi_head_attention(
        params, jnp.asarray(x), jnp.asarray(src), num_heads=4, key_mask=jnp.asarray(key_mask))
    out_c, prob_c = multi_head_attention(
        params, jnp.asarray(x), jnp.asarray(src[:, :25]), num_heads=4)
    np.testing.assert_allclose(np.asarray(out_m), np.asarray(out_c), rtol=RTOL, atol=ATOL)
    np.testing.assert_allclose(np.asarray(prob_m[..., :25]), np.asarray(prob_c),
                               rtol=RTOL, atol=ATOL)


def test_shared_attention_parity(reference_path):
    from nets.layers import SharedAttentionalPropagation

    torch.manual_seed(3)
    d = 64
    tm = SharedAttentionalPropagation(
        feature_dim=d, num_heads=4, sharing_attention=True, ac_fn="relu", norm_fn="in").eval()
    sd = tm.state_dict()
    params = {
        "proj": _conv1d(sd, "proj"),
        "merge": _conv1d(sd, "merge"),
        "mlp": convert_mlp(sd, "mlp", 2, "in"),
    }
    rs = np.random.RandomState(4)
    x = rs.randn(2, 30, d).astype(np.float32)
    src = rs.randn(2, 30, d).astype(np.float32)
    prob = rs.rand(2, 4, 30, 30).astype(np.float32)
    prob /= prob.sum(-1, keepdims=True)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x).transpose(1, 2), torch.from_numpy(src).transpose(1, 2),
                 prob=torch.from_numpy(prob)).transpose(1, 2).numpy()
    msg = attention_from_prob(params, jnp.asarray(src), jnp.asarray(prob), num_heads=4)
    y = jnp.concatenate([jnp.asarray(x), msg], axis=-1)
    out, _ = mlp_ops.mlp_apply(params["mlp"], y, norm_fn="in", ac_fn="relu")
    np.testing.assert_allclose(np.asarray(out), ref, rtol=RTOL, atol=ATOL)


def test_sinkhorn_parity():
    rs = np.random.RandomState(5)
    dist = rs.randn(2, 17, 23).astype(np.float32)
    bin_score = np.float32(1.3)
    ref = torch_sink_algorithm(torch.from_numpy(dist), torch.tensor(bin_score), 20).numpy()
    out = sink_algorithm(jnp.asarray(dist), jnp.asarray(bin_score), 20)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-3, atol=1e-6)


def test_sinkhorn_masked_equals_compacted():
    rs = np.random.RandomState(6)
    n, m, nv, mv = 32, 40, 19, 27
    dist_c = rs.randn(2, nv, mv).astype(np.float32)
    bin_score = np.float32(0.7)
    dist = np.zeros((2, n, m), np.float32)
    dist[:, :nv, :mv] = dist_c
    valid0 = np.zeros((2, n), bool); valid0[:, :nv] = True
    valid1 = np.zeros((2, m), bool); valid1[:, :mv] = True

    full = sink_algorithm(jnp.asarray(dist), jnp.asarray(bin_score), 20,
                          jnp.asarray(valid0), jnp.asarray(valid1))
    comp = sink_algorithm(jnp.asarray(dist_c), jnp.asarray(bin_score), 20)
    full = np.asarray(full)
    comp = np.asarray(comp)
    np.testing.assert_allclose(full[:, :nv, :mv], comp[:, :nv, :mv], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(full[:, :nv, -1], comp[:, :nv, -1], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(full[:, -1, :mv], comp[:, -1, :mv], rtol=1e-5, atol=1e-6)
    # padded rows/cols carry exactly zero mass
    assert np.abs(full[:, nv:-1, :]).max() == 0.0
    assert np.abs(full[:, :, mv:-1]).max() == 0.0


def test_dual_softmax_parity():
    rs = np.random.RandomState(7)
    dist = rs.randn(2, 11, 13).astype(np.float32)
    bin_score = np.float32(0.5)
    M = torch.from_numpy(dist)
    dustbin = torch.tensor(bin_score)
    M = torch.cat([M, dustbin.expand([M.shape[0], M.shape[1], 1])], dim=-1)
    M = torch.cat([M, dustbin.expand([M.shape[0], 1, M.shape[2]])], dim=-2)
    ref = torch.exp(torch.log_softmax(M, dim=-1) + torch.log_softmax(M, dim=1)).numpy()
    out = dual_softmax(jnp.asarray(dist), jnp.asarray(bin_score))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-3, atol=1e-6)


def test_compute_matches_reference_logic():
    """Mutual-NN extraction vs an independent numpy restatement of
    reference gm.py:305-320."""
    rs = np.random.RandomState(8)
    scores = rs.rand(3, 12, 15).astype(np.float32)
    p = 0.2

    idx0, idx1, ms0, ms1 = compute_matches(jnp.asarray(scores), p=p)
    inner = scores[:, :-1, :-1]
    ref_i0 = inner.argmax(2)
    ref_i1 = inner.argmax(1)
    ref_max0 = inner.max(2)
    b, n, m = inner.shape
    mutual0 = np.arange(n)[None] == np.take_along_axis(ref_i1, ref_i0, 1)
    mutual1 = np.arange(m)[None] == np.take_along_axis(ref_i0, ref_i1, 1)
    mscores0 = np.where(mutual0, ref_max0, 0.0)
    mscores1 = np.where(mutual1, np.take_along_axis(mscores0, ref_i1, 1), 0.0)
    valid0 = mutual0 & (mscores0 > p)
    valid1 = mutual1 & np.take_along_axis(valid0, ref_i1, 1)
    exp_i0 = np.where(valid0, ref_i0, -1)
    exp_i1 = np.where(valid1, ref_i1, -1)

    np.testing.assert_array_equal(np.asarray(idx0), exp_i0)
    np.testing.assert_array_equal(np.asarray(idx1), exp_i1)
    np.testing.assert_allclose(np.asarray(ms0), mscores0, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(ms1), mscores1, rtol=1e-6)
