"""Collective API over the 8-device virtual CPU mesh (conftest provisions it).

Verifies the TPU-native replacements for the reference's NCCL surface:
all-reduce (DDP grads, train.py:83), all-reduce-mean (reduce_tensor,
train_utils.py:30-35), gather/scatter/permute building blocks.
"""
import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from impx.parallel import collectives as col
from impx.parallel.mesh import make_mesh

N_DEV = 8


def _mesh():
    assert len(jax.devices()) >= N_DEV
    return make_mesh(jax.devices()[:N_DEV])


def test_psum_pmean_match_global_reduction():
    mesh = _mesh()
    x = jnp.arange(N_DEV * 4, dtype=jnp.float32).reshape(N_DEV, 4)
    total = col.under(mesh, lambda s: col.psum(jnp.sum(s)), x)
    np.testing.assert_allclose(float(total), float(jnp.sum(x)))
    mean = col.under(mesh, lambda s: col.pmean(jnp.sum(s)), x)
    np.testing.assert_allclose(float(mean), float(jnp.sum(x)) / N_DEV)


def test_all_gather_roundtrip():
    mesh = _mesh()
    x = jnp.arange(N_DEV * 3, dtype=jnp.float32).reshape(N_DEV, 3)
    out = col.under(mesh, lambda s: col.all_gather(s), x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x))


def test_reduce_scatter_equals_psum_slice():
    mesh = _mesh()
    # every shard holds a full-length vector; reduce_scatter returns the
    # summed slice owned by each device, reassembled by sharded output specs
    x = jnp.asarray(np.random.RandomState(0).rand(N_DEV, N_DEV * 2), jnp.float32)
    out = col.under(mesh, lambda s: col.reduce_scatter(s[0]), x,
                    out_specs=P("data"))
    np.testing.assert_allclose(np.asarray(out), np.asarray(jnp.sum(x, axis=0)),
                               rtol=1e-6)


def test_ring_shift_permutes_shards():
    mesh = _mesh()
    x = jnp.arange(N_DEV, dtype=jnp.float32).reshape(N_DEV, 1)
    out = col.under(mesh, lambda s: col.ring_shift(s, shift=1), x,
                    out_specs=P("data"))
    expect = np.roll(np.arange(N_DEV), 1).reshape(N_DEV, 1)
    np.testing.assert_allclose(np.asarray(out), expect)


def test_batch_norm_axis_name_syncs_moments():
    """The SyncBatchNorm path (impx/ops/norms.py batch_norm_train with
    axis_name): each device normalizes its batch shard with pmean-synced
    moments, which must equal single-device BN over the full batch
    (reference train.py:81 SyncBatchNorm over NCCL)."""
    from impx.ops.norms import batch_norm_train

    mesh = _mesh()
    rs = np.random.RandomState(7)
    x = jnp.asarray(rs.randn(N_DEV * 2, 16, 32).astype(np.float32))
    scale = jnp.asarray(rs.rand(32).astype(np.float32) + 0.5)
    bias = jnp.asarray(rs.randn(32).astype(np.float32))

    y_ref, m_ref, v_ref = batch_norm_train(x, scale, bias)

    def shard_fn(xs):
        y, m, v = batch_norm_train(xs, scale, bias, axis_name="data")
        return y, m, v

    y, m, v = col.under(mesh, shard_fn, x,
                        out_specs=(P("data"), P(), P()))
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(m), np.asarray(m_ref), atol=1e-6)
    # var is computed from pmean'd E[x^2]-E[x]^2 per shard; equal up to fp
    np.testing.assert_allclose(np.asarray(v), np.asarray(v_ref), atol=1e-5)


def test_axis_index_identifies_shards():
    mesh = _mesh()
    x = jnp.zeros((N_DEV, 1), jnp.float32)
    out = col.under(mesh, lambda s: s + col.axis_index(), x,
                    out_specs=P("data"))
    np.testing.assert_allclose(np.asarray(out)[:, 0], np.arange(N_DEV))
