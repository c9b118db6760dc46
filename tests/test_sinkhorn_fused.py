"""Fused Sinkhorn kernel (impx/ops/pallas/sinkhorn.py) vs the XLA reference
path (impx/ops/sinkhorn.py:sink_algorithm, itself parity-tested against the
torch reference nets/layers.py:27-46 in test_ops_parity.py)."""
import numpy as np
import jax.numpy as jnp
import pytest

from impx.ops.sinkhorn import sink_algorithm
from impx.ops.matching import compute_matches, matches_from_stats
from impx.ops.pallas.sinkhorn import (
    sinkhorn_fused, sinkhorn_fused_stats, sinkhorn_plan_from_uv)


def _case(b, n, m, n0, n1, seed=0):
    rs = np.random.RandomState(seed)
    dist = jnp.asarray(rs.randn(b, n, m) * 2, jnp.float32)
    valid0 = jnp.asarray(np.arange(n)[None] < np.asarray(n0)[:, None])
    valid1 = jnp.asarray(np.arange(m)[None] < np.asarray(n1)[:, None])
    return dist, jnp.asarray(0.7, jnp.float32), valid0, valid1


@pytest.mark.parametrize("n,m,n0,n1", [
    (256, 256, [200, 256], [180, 256]),   # masked + full
    (256, 128, [256, 100], [128, 90]),    # rectangular
    (512, 512, [30, 512], [25, 512]),     # heavily masked
])
def test_fused_plan_and_matches_equal_xla(n, m, n0, n1):
    dist, bin_, valid0, valid1 = _case(2, n, m, n0, n1)
    ref = sink_algorithm(dist, bin_, 20, valid0, valid1)

    stats = sinkhorn_fused_stats(dist, bin_, 20, valid0, valid1, interpret=True)
    plan = sinkhorn_plan_from_uv(dist, bin_, stats["u"], stats["v"], valid0, valid1)
    np.testing.assert_allclose(np.asarray(plan), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)

    i0r, i1r, ms0r, ms1r = compute_matches(ref, 0.2, valid0, valid1)
    i0f, i1f, ms0f, ms1f = matches_from_stats(
        stats["max0"], stats["idx0"], stats["idx1"], 0.2, valid0, valid1)
    np.testing.assert_array_equal(np.asarray(i0r), np.asarray(i0f))
    np.testing.assert_array_equal(np.asarray(i1r), np.asarray(i1f))
    np.testing.assert_allclose(np.asarray(ms0r), np.asarray(ms0f), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ms1r), np.asarray(ms1f), atol=1e-5)


def test_fused_pooling_masses():
    dist, bin_, valid0, valid1 = _case(2, 256, 256, [200, 256], [180, 256], seed=3)
    ref = np.asarray(sink_algorithm(dist, bin_, 20, valid0, valid1))
    stats = sinkhorn_fused_stats(dist, bin_, 20, valid0, valid1, interpret=True)
    inner = ref[:, :-1, :-1] * np.asarray(valid0)[:, :, None] * \
        np.asarray(valid1)[:, None, :]
    np.testing.assert_allclose(inner.sum(2), np.asarray(stats["rowmass"]), atol=1e-5)
    np.testing.assert_allclose(inner.sum(1), np.asarray(stats["colmass"]), atol=1e-5)


def test_fused_drop_in_plan():
    dist, bin_, valid0, valid1 = _case(1, 128, 128, [128], [128], seed=7)
    ref = sink_algorithm(dist, bin_, 10, valid0, valid1)
    plan = sinkhorn_fused(dist, bin_, 10, valid0, valid1, interpret=True)
    np.testing.assert_allclose(np.asarray(plan), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)
    # padded cells carry exactly zero mass
    dist, bin_, valid0, valid1 = _case(1, 128, 128, [90], [80], seed=8)
    plan = np.asarray(sinkhorn_fused(dist, bin_, 10, valid0, valid1, interpret=True))
    assert np.all(plan[:, 90:-1, :] == 0)
    assert np.all(plan[:, :, 80:-1] == 0)
