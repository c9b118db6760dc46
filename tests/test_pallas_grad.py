"""Custom VJP of the fused attention kernel vs XLA autodiff (interpret mode)."""
import numpy as np

import jax
import jax.numpy as jnp

from impx.ops.pallas.attention import mha_fused


def _ref_attention(q, k, v, key_mask=None):
    s = jnp.einsum("bhnd,bhmd->bhnm", q, k) / (q.shape[-1] ** 0.5)
    if key_mask is not None:
        s = jnp.where(key_mask[:, None, None, :], s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhnm,bhmd->bhnd", p, v)


def test_mha_fused_grads_match_xla():
    rs = np.random.RandomState(0)
    b, h, n, m, dh = 2, 2, 64, 128, 32
    q = jnp.asarray(rs.randn(b, h, n, dh), jnp.float32)
    k = jnp.asarray(rs.randn(b, h, m, dh), jnp.float32)
    v = jnp.asarray(rs.randn(b, h, m, dh), jnp.float32)
    mask = jnp.asarray(rs.rand(b, m) > 0.3)
    cot = jnp.asarray(rs.randn(b, h, n, dh), jnp.float32)

    def loss_pl(q, k, v):
        return jnp.sum(mha_fused(q, k, v, mask, block_q=32, interpret=True) * cot)

    def loss_ref(q, k, v):
        return jnp.sum(_ref_attention(q, k, v, mask) * cot)

    g_pl = jax.grad(loss_pl, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_, name in zip(g_pl, g_ref, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=2e-4, atol=2e-4,
                                   err_msg=f"d{name} mismatch")


def test_mha_fused_grads_under_scan():
    """Grads flow through a scanned chain of kernel calls (the training path)."""
    rs = np.random.RandomState(1)
    b, h, n, dh = 1, 2, 64, 32
    q = jnp.asarray(rs.randn(b, h, n, dh), jnp.float32)
    kv = jnp.asarray(rs.randn(b, h, n, dh), jnp.float32)

    def f(q, use_pl):
        def body(c, _):
            if use_pl:
                o = mha_fused(c, kv, kv, None, block_q=64, interpret=True)
            else:
                o = _ref_attention(c, kv, kv)
            return c + 0.1 * o, None
        out, _ = jax.lax.scan(body, q, None, length=3)
        return jnp.sum(out ** 2)

    g_pl = jax.grad(lambda q: f(q, True))(q)
    g_ref = jax.grad(lambda q: f(q, False))(q)
    np.testing.assert_allclose(np.asarray(g_pl), np.asarray(g_ref),
                               rtol=2e-4, atol=2e-4)
