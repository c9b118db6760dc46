"""Device-side (jnp) matchable-scene generator: same distribution/conventions
as the host synthesize_pair (impx/data/synthetic.py) but generated inside jit
for honest relay-proof benchmarking (bench_suite trained-iterative + latency
configs)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from impx.data.synthetic_device import synthesize_feed_device
from impx.geometry.epipolar import sampson_distance


@pytest.fixture(scope="module")
def gen():
    feed, R, t = jax.jit(
        lambda k: synthesize_feed_device(k, 4, 512, 64))(jax.random.PRNGKey(0))
    return feed, np.asarray(R), np.asarray(t)


def test_shapes_and_dtypes(gen):
    feed, R, t = gen
    assert feed["descriptors0"].shape == (4, 512, 64)
    assert feed["norm_keypoints0"].shape == (4, 512, 2)
    assert feed["x1n"].shape == (4, 512, 2)
    assert feed["valid0"].dtype == bool and bool(feed["valid0"].all())
    assert R.shape == (4, 3, 3) and t.shape == (4, 3)
    # proper rotations, unit translations
    for b in range(4):
        np.testing.assert_allclose(R[b] @ R[b].T, np.eye(3), atol=1e-5)
        assert np.linalg.det(R[b]) > 0.99
        np.testing.assert_allclose(np.linalg.norm(t[b]), 1.0, atol=1e-5)


def test_epipolar_consistency(gen):
    """Inlier correspondences satisfy x1^T E x0 = 0 (to pixel-noise level);
    outliers don't. E = [t]x R, the synthesize_pair convention."""
    feed, R, t = gen
    n_in = 128  # batch=4, n=512, inlier_frac 0.25
    for b in range(4):
        tb = t[b]
        E = np.array([[0, -tb[2], tb[1]],
                      [tb[2], 0, -tb[0]],
                      [-tb[1], tb[0], 0]]) @ R[b]
        d_in = np.sqrt(np.asarray(sampson_distance(
            feed["x0n"][b, :n_in], feed["x1n"][b, :n_in], jnp.asarray(E))))
        d_out = np.sqrt(np.asarray(sampson_distance(
            feed["x0n"][b, n_in:], feed["x1n"][b, n_in:], jnp.asarray(E))))
        assert np.median(d_in) < 3e-3, np.median(d_in)     # ~pixel noise / f
        assert np.median(d_out) > 30 * np.median(d_in)


def test_descriptor_correlation(gen):
    """True correspondences share descriptors (cos ~ 0.99 at noise 0.15);
    outliers are independent."""
    feed, _, _ = gen
    d0, d1 = np.asarray(feed["descriptors0"]), np.asarray(feed["descriptors1"])
    cos = np.sum(d0 * d1, -1)
    assert cos[:, :128].mean() > 0.9
    assert abs(cos[:, 128:].mean()) < 0.1


def test_distinct_per_key():
    f1, _, _ = synthesize_feed_device(jax.random.PRNGKey(1), 1, 64, 16)
    f2, _, _ = synthesize_feed_device(jax.random.PRNGKey(2), 1, 64, 16)
    assert not np.allclose(np.asarray(f1["descriptors0"]),
                           np.asarray(f2["descriptors0"]))
