"""jax.export serving artifact: serialize -> deserialize -> same matches."""
import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

from impx.models import MatcherConfig, DGNNS
from impx.tools.export import export_matcher, load_matcher, _example_feed


def _model():
    cfg = MatcherConfig(descriptor_dim=32, keypoint_encoder=(16, 32),
                        n_layers=3, sinkhorn_iterations=10, norm_fn="in",
                        attn_impl="xla")
    m = DGNNS(cfg)
    return m, m.init(jax.random.PRNGKey(0))


def _feed(n=48, dim=32, batch=2):
    k = jax.random.split(jax.random.PRNGKey(7), 6)
    f = _example_feed(n, dim, batch)
    f["descriptors0"] = jax.random.normal(k[0], f["descriptors0"].shape)
    f["descriptors1"] = jax.random.normal(k[1], f["descriptors1"].shape)
    f["norm_keypoints0"] = 0.5 * jax.random.normal(k[2], f["norm_keypoints0"].shape)
    f["norm_keypoints1"] = 0.5 * jax.random.normal(k[3], f["norm_keypoints1"].shape)
    f["scores0"] = jax.random.uniform(k[4], f["scores0"].shape)
    f["scores1"] = jax.random.uniform(k[5], f["scores1"].shape)
    f["valid0"] = jnp.ones(f["valid0"].shape, bool)
    f["valid1"] = jnp.ones(f["valid1"].shape, bool)
    return f


def test_export_roundtrip_matches():
    model, params = _model()
    feed = _feed()
    blob = export_matcher(model, params, n_kpts=48, batch=2)
    assert isinstance(blob, bytes) and len(blob) > 0

    fn = load_matcher(blob)
    out = fn(feed)
    ref = model.produce_matches(params, feed, p=0.2, only_last=True,
                                with_scores=False)
    np.testing.assert_array_equal(np.asarray(out["indices0"]),
                                  np.asarray(ref["indices0"][-1]))
    np.testing.assert_allclose(np.asarray(out["mscores0"]),
                               np.asarray(ref["mscores0"][-1]), rtol=1e-6)


def test_export_runtime_params():
    """bake_params=False keeps weights as a runtime argument — one artifact,
    many checkpoints."""
    model, params = _model()
    feed = _feed()
    blob = export_matcher(model, params, n_kpts=48, batch=2, bake_params=False)
    fn = load_matcher(blob)

    params2 = model.init(jax.random.PRNGKey(3))
    out2 = fn(feed, params2)
    ref2 = model.produce_matches(params2, feed, p=0.2, only_last=True,
                                 with_scores=False)
    np.testing.assert_array_equal(np.asarray(out2["indices0"]),
                                  np.asarray(ref2["indices0"][-1]))


def test_export_multiplatform():
    """Cross-platform artifact: lowering for ("cpu", "tpu") works without
    TPU hardware present; the artifact still runs on CPU."""
    model, params = _model()
    feed = _feed()
    blob = export_matcher(model, params, n_kpts=48, batch=2,
                          platforms=("cpu", "tpu"))
    out = load_matcher(blob)(feed)
    ref = model.produce_matches(params, feed, p=0.2, only_last=True,
                                with_scores=False)
    np.testing.assert_array_equal(np.asarray(out["indices0"]),
                                  np.asarray(ref["indices0"][-1]))
