"""Pipeline parallelism (GPipe microbatch schedule, impx/parallel/pp.py).

The pipelined forward must reproduce the single-device scan fast path
exactly: same final descriptors => same matches/mscores, for several
(stages, microbatches) shapes on the 8-device virtual CPU mesh — including
the bubble-heavy M=1 case and stage counts that split the attention-sharing
pattern across stage boundaries."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from impx.models import MatcherConfig, DGNNS
from impx.models.fast import stack_params, forward_scan
from impx.parallel.pp import make_stage_mesh, pipeline_forward_scan


def _setup(n_layers=4, dim=32, batch=4, n=24, seed=0):
    cfg = MatcherConfig(descriptor_dim=dim, keypoint_encoder=(16, 32),
                        n_layers=n_layers, sinkhorn_iterations=10,
                        norm_fn="in", n_min_tokens=8)
    model = DGNNS(cfg)
    params = model.init(jax.random.PRNGKey(seed))
    stacked = stack_params(params, cfg)
    rs = np.random.RandomState(seed)
    valid0 = np.ones((batch, n), bool)
    valid0[:, n - 3:] = False  # exercise padding masks through the pipeline
    data = {
        "descriptors0": jnp.asarray(rs.randn(batch, n, dim), jnp.float32),
        "descriptors1": jnp.asarray(rs.randn(batch, n, dim), jnp.float32),
        "norm_keypoints0": jnp.asarray(rs.rand(batch, n, 2) - 0.5, jnp.float32),
        "norm_keypoints1": jnp.asarray(rs.rand(batch, n, 2) - 0.5, jnp.float32),
        "scores0": jnp.asarray(rs.rand(batch, n), jnp.float32),
        "scores1": jnp.asarray(rs.rand(batch, n), jnp.float32),
        "valid0": jnp.asarray(valid0),
        "valid1": jnp.asarray(np.ones((batch, n), bool)),
    }
    return model, stacked, data


@pytest.mark.parametrize("n_stages,n_microbatches", [(2, 2), (2, 1), (4, 2),
                                                     (2, 4)])
def test_pipeline_matches_forward_scan(n_stages, n_microbatches):
    model, stacked, data = _setup()
    ref = forward_scan(model, stacked, data, p=0.2, only_last=True)

    mesh = make_stage_mesh(n_stages)
    out = pipeline_forward_scan(model, stacked, data, mesh,
                                n_microbatches=n_microbatches, p=0.2)

    np.testing.assert_array_equal(np.asarray(ref["indices0"][0]),
                                  np.asarray(out["indices0"][0]))
    np.testing.assert_allclose(np.asarray(ref["mscores0"][0]),
                               np.asarray(out["mscores0"][0]),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ref["scores"][0]),
                               np.asarray(out["scores"][0]),
                               rtol=1e-4, atol=1e-6)


def test_pipeline_rejects_bad_shapes():
    model, stacked, data = _setup(n_layers=3)
    mesh = make_stage_mesh(2)
    with pytest.raises(ValueError, match="not divisible"):
        pipeline_forward_scan(model, stacked, data, mesh, n_microbatches=2)
    model4, stacked4, data4 = _setup(n_layers=4, batch=3)
    with pytest.raises(ValueError, match="not divisible"):
        pipeline_forward_scan(model4, stacked4, data4, mesh,
                              n_microbatches=2)
