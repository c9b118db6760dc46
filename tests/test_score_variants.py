"""Score-head variants: bf16 Sinkhorn plan accuracy, masked dual-softmax,
dual-softmax on the scan fast path."""
import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

from impx.models import MatcherConfig, DGNNS
from impx.ops.sinkhorn import sink_algorithm, dual_softmax


def test_sinkhorn_bf16_plan_close_to_fp32():
    rs = np.random.RandomState(0)
    dist = jnp.asarray(rs.randn(2, 65, 65), jnp.float32)
    bin_ = jnp.asarray(1.0)
    p32 = np.asarray(sink_algorithm(dist, bin_, 20))
    p16 = np.asarray(sink_algorithm(dist, bin_, 20, plan_dtype=jnp.bfloat16))
    # the plan entries that matter for matching (> match threshold 0.1)
    sel = p32 > 0.05
    rel = np.abs(p16[sel] - p32[sel]) / p32[sel]
    assert rel.max() < 0.05, rel.max()


def test_dual_softmax_masked_equals_compacted():
    rs = np.random.RandomState(1)
    n, m, nv, mv = 24, 32, 13, 17
    dist_c = rs.randn(2, nv, mv).astype(np.float32)
    bin_ = np.float32(0.7)
    dist = np.zeros((2, n, m), np.float32)
    dist[:, :nv, :mv] = dist_c
    v0 = np.zeros((2, n), bool); v0[:, :nv] = True
    v1 = np.zeros((2, m), bool); v1[:, :mv] = True
    full = np.asarray(dual_softmax(jnp.asarray(dist), jnp.asarray(bin_),
                                   jnp.asarray(v0), jnp.asarray(v1)))
    comp = np.asarray(dual_softmax(jnp.asarray(dist_c), jnp.asarray(bin_)))
    np.testing.assert_allclose(full[:, :nv, :mv], comp[:, :nv, :mv],
                               rtol=1e-5, atol=1e-7)
    assert full[:, nv:-1, :].max() < 1e-12
    assert full[:, :, mv:-1].max() < 1e-12


def test_scan_path_dual_softmax():
    """--use_dual_softmax combined with the fused scan path."""
    cfg = MatcherConfig(descriptor_dim=64, n_layers=3, with_sinkhorn=False,
                        norm_fn="in", attn_impl="pallas")
    cfg_xla = dataclasses.replace(cfg, attn_impl="xla")
    m_pl, m_xla = DGNNS(cfg), DGNNS(cfg_xla)
    params = m_pl.init(jax.random.PRNGKey(0))
    rs = np.random.RandomState(2)
    b, n, d = 2, 48, 64
    data = {
        "descriptors0": jnp.asarray(rs.randn(b, n, d), jnp.float32),
        "descriptors1": jnp.asarray(rs.randn(b, n, d), jnp.float32),
        "norm_keypoints0": jnp.asarray(rs.rand(b, n, 2) - 0.5, jnp.float32),
        "norm_keypoints1": jnp.asarray(rs.rand(b, n, 2) - 0.5, jnp.float32),
        "scores0": jnp.asarray(rs.rand(b, n), jnp.float32),
        "scores1": jnp.asarray(rs.rand(b, n), jnp.float32),
    }
    out_pl = m_pl.produce_matches(params, data, p=0.2, only_last=True)
    out_xla = m_xla.produce_matches(params, data, p=0.2, only_last=True)
    np.testing.assert_array_equal(np.asarray(out_pl["indices0"][-1]),
                                  np.asarray(out_xla["indices0"][-1]))
