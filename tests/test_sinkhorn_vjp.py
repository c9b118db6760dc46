"""Custom Sinkhorn VJP == plain-AD unrolled-loop gradient.

sink_algorithm's u/v loop carries a restructured custom VJP (one stacked
rank-2T matmul for the plan gradient instead of per-sweep accumulation).
These tests pin it to the plain jax.grad of an AD-only restatement of the
same loop — the gradient the reference's autograd computes through
nets/layers.py:27-46."""
import jax
import jax.numpy as jnp
import numpy as np

from impx.ops.sinkhorn import EPS, _NEG, _pad_with_dustbin, _padded_masks, \
    sink_algorithm


def _sink_ad(dist, dustbin, iterations, valid0=None, valid1=None,
             plan_dtype=None):
    """AD-only restatement (the pre-custom-VJP implementation)."""
    b, n, m = dist.shape
    f0, f1, v0p, v1p = _padded_masks(b, n, m, valid0, valid1, dist.dtype)
    n0 = jnp.sum(f0, axis=1, keepdims=True)
    n1 = jnp.sum(f1, axis=1, keepdims=True)
    M = _pad_with_dustbin(dist, dustbin)
    M = jnp.where(v0p[:, :, None] & v1p[:, None, :], M, _NEG)
    r = jnp.concatenate([f0, n0 + 1.0], axis=1)
    c = jnp.concatenate([f1, n1 + 1.0], axis=1)
    p = jax.nn.softmax(M, axis=-1)
    p_loop = p.astype(plan_dtype) if plan_dtype is not None else p
    u, v = jnp.ones_like(r), jnp.ones_like(c)
    for _ in range(iterations):  # unrolled: plain AD
        u = r / (jnp.einsum("bnm,bm->bn", p_loop, v.astype(p_loop.dtype),
                            preferred_element_type=jnp.float32) + EPS)
        v = c / (jnp.einsum("bnm,bn->bm", p_loop, u.astype(p_loop.dtype),
                            preferred_element_type=jnp.float32) + EPS)
    return p * u[:, :, None] * v[:, None, :]


def _case(seed, b=2, n=12, m=10, masked=False):
    k = jax.random.split(jax.random.PRNGKey(seed), 3)
    dist = jax.random.normal(k[0], (b, n, m))
    dustbin = jnp.asarray(0.3)
    valid0 = valid1 = None
    if masked:
        valid0 = jnp.arange(n)[None, :] < jnp.asarray([n, n - 4])[:, None]
        valid1 = jnp.arange(m)[None, :] < jnp.asarray([m - 3, m])[:, None]
    return dist, dustbin, valid0, valid1


def _loss(fn, dist, dustbin, valid0, valid1, **kw):
    w = jnp.cos(jnp.arange(dist.shape[1] + 1))[None, :, None] * \
        jnp.sin(jnp.arange(dist.shape[2] + 1))[None, None, :]
    return jnp.sum(fn(dist, dustbin, 10, valid0, valid1, **kw) * w)


def test_values_and_grads_match_ad():
    for masked in (False, True):
        dist, dustbin, v0, v1 = _case(0, masked=masked)
        out = sink_algorithm(dist, dustbin, 10, v0, v1)
        ref = _sink_ad(dist, dustbin, 10, v0, v1)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-6, atol=1e-8)

        g = jax.grad(lambda d, db: _loss(sink_algorithm, d, db, v0, v1),
                     argnums=(0, 1))(dist, dustbin)
        gr = jax.grad(lambda d, db: _loss(_sink_ad, d, db, v0, v1),
                      argnums=(0, 1))(dist, dustbin)
        for a, b_ in zip(g, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       rtol=1e-5, atol=1e-7)


def test_grads_match_ad_bf16_plan():
    dist, dustbin, v0, v1 = _case(3)
    g = jax.grad(lambda d: _loss(sink_algorithm, d, dustbin, v0, v1,
                                 plan_dtype="bfloat16"))(dist)
    gr = jax.grad(lambda d: _loss(_sink_ad, d, dustbin, v0, v1,
                                  plan_dtype="bfloat16"))(dist)
    # bf16 plan storage: both sides accumulate in fp32 but read the bf16
    # plan in different orders, so grads agree only to bf16 resolution
    np.testing.assert_allclose(np.asarray(g), np.asarray(gr),
                               rtol=5e-2, atol=1e-3)


def test_jit_and_scan_compatible():
    """The VJP must survive jit + scan-over-layers (the training path)."""
    dist, dustbin, v0, v1 = _case(5)

    @jax.jit
    def f(d):
        def body(acc, _):
            p = sink_algorithm(d + acc * 0.01, dustbin, 5, v0, v1)
            return acc + jnp.sum(p * p), None
        return jax.lax.scan(body, jnp.zeros(()), None, length=3)[0]

    g = jax.grad(f)(dist)
    assert np.isfinite(np.asarray(g)).all()


def _log_ot_ad(dist, dustbin, iterations, valid0=None, valid1=None):
    """AD-only restatement of log_optimal_transport (pre-custom-VJP)."""
    from impx.ops.sinkhorn import log_optimal_transport  # noqa: F401  (parity target)
    b, n, m = dist.shape
    f0, f1, v0p, v1p = _padded_masks(b, n, m, valid0, valid1, dist.dtype)
    n0 = jnp.sum(f0, axis=1, keepdims=True)
    n1 = jnp.sum(f1, axis=1, keepdims=True)
    Z = _pad_with_dustbin(dist, dustbin)
    Z = jnp.where(v0p[:, :, None] & v1p[:, None, :], Z, _NEG)
    norm = -jnp.log(n0 + n1)
    log_mu = jnp.concatenate([norm * f0 + _NEG * (1 - f0), jnp.log(n1) + norm], axis=1)
    log_nu = jnp.concatenate([norm * f1 + _NEG * (1 - f1), jnp.log(n0) + norm], axis=1)
    u, v = jnp.zeros_like(log_mu), jnp.zeros_like(log_nu)
    for _ in range(iterations):  # unrolled: plain AD
        u = log_mu - jax.nn.logsumexp(Z + v[:, None, :], axis=2)
        v = log_nu - jax.nn.logsumexp(Z + u[:, :, None], axis=1)
    return Z + u[:, :, None] + v[:, None, :] - norm[:, :, None]


def _log_loss(fn, dist, dustbin, valid0, valid1):
    """Weighted sum over VALID cells only (the custom VJP treats pad-row/col
    gradients as zero, as every downstream loss masks them)."""
    from impx.ops.sinkhorn import _padded_masks as pm
    b, n, m = dist.shape
    _, _, v0p, v1p = pm(b, n, m, valid0, valid1, dist.dtype)
    ok = (v0p[:, :, None] & v1p[:, None, :]).astype(dist.dtype)
    w = jnp.cos(jnp.arange(n + 1))[None, :, None] * \
        jnp.sin(jnp.arange(m + 1))[None, None, :]
    return jnp.sum(fn(dist, dustbin, 10, valid0, valid1) * w * ok)


def test_log_ot_values_and_grads_match_ad():
    from impx.ops.sinkhorn import log_optimal_transport

    for masked in (False, True):
        dist, dustbin, v0, v1 = _case(7, masked=masked)
        out = log_optimal_transport(dist, dustbin, 10, v0, v1)
        ref = _log_ot_ad(dist, dustbin, 10, v0, v1)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-6)

        g = jax.grad(lambda d, db: _log_loss(log_optimal_transport,
                                             d, db, v0, v1),
                     argnums=(0, 1))(dist, dustbin)
        gr = jax.grad(lambda d, db: _log_loss(_log_ot_ad, d, db, v0, v1),
                      argnums=(0, 1))(dist, dustbin)
        for a, b_ in zip(g, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       rtol=1e-4, atol=1e-6)


def test_log_ot_fused_grad_uses_custom_path():
    """The fused kernel's backward routes through log_optimal_transport —
    grads must agree with plain AD there too (interpreter mode on CPU)."""
    from impx.ops.pallas.log_sinkhorn import log_optimal_transport_fused

    dist, dustbin, v0, v1 = _case(9, b=1, n=8, m=8)
    g = jax.grad(lambda d: jnp.sum(
        log_optimal_transport_fused(d, dustbin, 10, v0, v1, 8, True)
        * jnp.cos(jnp.arange(9.0))[None, :, None]))(dist)
    gr = jax.grad(lambda d: jnp.sum(
        _log_ot_ad(d, dustbin, 10, v0, v1)
        * jnp.cos(jnp.arange(9.0))[None, :, None]))(dist)
    np.testing.assert_allclose(np.asarray(g), np.asarray(gr),
                               rtol=1e-4, atol=1e-6)
