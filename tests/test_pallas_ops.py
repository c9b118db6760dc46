"""Fused Pallas attention kernels vs the XLA reference path (interpret mode on
CPU — the same kernels compile for TPU)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from impx.ops.pallas.attention import mha_fused, attention_key_mass


def _ref_attention(q, k, v, key_mask=None):
    s = jnp.einsum("bhnd,bhmd->bhnm", q, k) / (q.shape[-1] ** 0.5)
    if key_mask is not None:
        s = jnp.where(key_mask[:, None, None, :], s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhnm,bhmd->bhnd", p, v), p


def test_mha_fused_matches_reference():
    rs = np.random.RandomState(0)
    b, h, n, m, dh = 2, 4, 128, 256, 64
    q = jnp.asarray(rs.randn(b, h, n, dh), jnp.float32)
    k = jnp.asarray(rs.randn(b, h, m, dh), jnp.float32)
    v = jnp.asarray(rs.randn(b, h, m, dh), jnp.float32)
    mask = jnp.asarray(rs.rand(b, m) > 0.3)

    ref, _ = _ref_attention(q, k, v, mask)
    out = mha_fused(q, k, v, mask, block_q=64, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)

    # no mask
    ref, _ = _ref_attention(q, k, v)
    out = mha_fused(q, k, v, None, block_q=128, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_attention_key_mass_matches_prob_sums():
    rs = np.random.RandomState(1)
    b, h, n, m, dh = 2, 4, 128, 128, 32
    q = jnp.asarray(rs.randn(b, h, n, dh), jnp.float32)
    k = jnp.asarray(rs.randn(b, h, m, dh), jnp.float32)
    key_mask = jnp.asarray(rs.rand(b, m) > 0.25)
    query_mask = jnp.asarray(rs.rand(b, n) > 0.25)

    _, p = _ref_attention(q, k, q, key_mask)
    ref_mass = jnp.einsum("bhnm,bn->bm", p, query_mask.astype(jnp.float32))
    mass = attention_key_mass(q, k, key_mask, query_mask, block_q=64, interpret=True)
    np.testing.assert_allclose(np.asarray(mass), np.asarray(ref_mass),
                               rtol=1e-4, atol=1e-4)


def _make_inputs(rs, b=2, n=64, dim=64):
    return {
        "descriptors0": jnp.asarray(rs.randn(b, n, dim), jnp.float32),
        "descriptors1": jnp.asarray(rs.randn(b, n, dim), jnp.float32),
        "norm_keypoints0": jnp.asarray(rs.rand(b, n, 2) - 0.5, jnp.float32),
        "norm_keypoints1": jnp.asarray(rs.rand(b, n, 2) - 0.5, jnp.float32),
        "scores0": jnp.asarray(rs.rand(b, n), jnp.float32),
        "scores1": jnp.asarray(rs.rand(b, n), jnp.float32),
    }


@pytest.mark.parametrize("model_name", ["dgnns", "adagmn"])
def test_model_pallas_equals_xla(model_name):
    """Full produce_matches: fused path == XLA path (incl. EIMP pooling
    decisions through the column-mass kernel)."""
    import dataclasses

    from impx.models import MatcherConfig, DGNNS, AdaGMN

    cfg_xla = MatcherConfig(descriptor_dim=64, n_layers=5, sinkhorn_iterations=10,
                            norm_fn="in", n_min_tokens=16, attn_impl="xla")
    cfg_pl = dataclasses.replace(cfg_xla, attn_impl="pallas")
    cls = DGNNS if model_name == "dgnns" else AdaGMN
    m_xla = cls(cfg_xla)
    m_pl = cls(cfg_pl)
    params = m_xla.init(jax.random.PRNGKey(0))

    data = _make_inputs(np.random.RandomState(2))
    out_xla = m_xla.produce_matches(params, data, p=0.2)
    out_pl = m_pl.produce_matches(params, data, p=0.2)

    for li in range(cfg_xla.n_layers):
        np.testing.assert_array_equal(
            np.asarray(out_xla["indices0"][li]), np.asarray(out_pl["indices0"][li]),
            err_msg=f"iteration {li}")
        np.testing.assert_allclose(
            np.asarray(out_xla["mscores0"][li]), np.asarray(out_pl["mscores0"][li]),
            rtol=1e-4, atol=1e-5)
