"""EIMP bucketed compaction (impx/models/fast.py:forward_scan_eimp_compact):
when the survivor count fits the bucket, physically gathering keypoints must
produce EXACTLY the mask-only path's matches, in original indexing
(the masked==compacted equivalence proven in tests/test_model_parity.py,
now exercised through the gather/scatter machinery)."""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from impx.models import MatcherConfig, AdaGMN
from impx.models.fast import (forward_scan_eimp, forward_scan_eimp_compact,
                              stack_params)


def _data(b, n, n_valid, seed=0):
    rs = np.random.RandomState(seed)
    valid = jnp.asarray(np.arange(n)[None] < np.asarray(n_valid)[:, None])
    return {
        "descriptors0": jnp.asarray(rs.randn(b, n, 64), jnp.float32),
        "descriptors1": jnp.asarray(rs.randn(b, n, 64), jnp.float32),
        "norm_keypoints0": jnp.asarray(rs.rand(b, n, 2) - 0.5, jnp.float32),
        "norm_keypoints1": jnp.asarray(rs.rand(b, n, 2) - 0.5, jnp.float32),
        "scores0": jnp.asarray(rs.rand(b, n), jnp.float32),
        "scores1": jnp.asarray(rs.rand(b, n), jnp.float32),
        "valid0": valid,
        "valid1": valid,
    }


def _model(compaction=(), n_layers=6, n_min_tokens=16):
    cfg = MatcherConfig(
        descriptor_dim=64, keypoint_encoder=(32, 64), n_layers=n_layers,
        sinkhorn_iterations=10, norm_fn="in", ac_fn="relu",
        n_min_tokens=n_min_tokens, first_it_to_update=2,
        attn_impl="pallas", compaction=compaction)
    return AdaGMN(cfg)


def test_compact_equals_masked_when_survivors_fit():
    # 100 valid keypoints in a 256 bucket; compact to 128 before iteration 4:
    # every survivor (<=100) fits, so outputs must be identical.
    b, n = 2, 256
    model_m = _model()
    model_c = _model(compaction=((4, 128),))
    params = model_m.init(jax.random.PRNGKey(0))
    stacked = stack_params(params, model_m.config)
    data = _data(b, n, [100, 80])

    out_m = forward_scan_eimp(model_m, stacked, data, p=0.1, with_scores=False)
    out_c = forward_scan_eimp_compact(model_c, stacked, data, p=0.1)

    assert len(out_m["indices0"]) == len(out_c["indices0"]) == 6
    for li in range(6):
        np.testing.assert_array_equal(
            np.asarray(out_m["indices0"][li]), np.asarray(out_c["indices0"][li]),
            err_msg=f"iteration {li}")
        np.testing.assert_allclose(
            np.asarray(out_m["mscores0"][li]), np.asarray(out_c["mscores0"][li]),
            atol=1e-6, err_msg=f"iteration {li}")
    np.testing.assert_array_equal(
        np.asarray(out_m["keep0"]), np.asarray(out_c["keep0"]))
    np.testing.assert_array_equal(
        np.asarray(out_m["keep1"]), np.asarray(out_c["keep1"]))
    # survivors fit => zero reported overflow
    assert (np.asarray(out_c["overflow0"]) == 0).all()
    assert (np.asarray(out_c["overflow1"]) == 0).all()


def test_compact_overflow_is_reported():
    """Survivors exceeding the bucket must be COUNTED, not silently dropped:
    256 valid keypoints forced into a 64 bucket at iteration 1 (before any
    pooling can shrink the keep set) guarantees 192 dropped per side."""
    b, n = 2, 256
    model_c = _model(compaction=((1, 64),))
    params = model_c.init(jax.random.PRNGKey(2))
    stacked = stack_params(params, model_c.config)
    data = _data(b, n, [256, 256], seed=5)
    out = forward_scan_eimp_compact(model_c, stacked, data, p=0.1)
    np.testing.assert_array_equal(np.asarray(out["overflow0"]), [192, 192])
    np.testing.assert_array_equal(np.asarray(out["overflow1"]), [192, 192])
    # partially-valid pair: 100 survivors into 64 => 36 dropped
    data2 = _data(b, n, [100, 40], seed=6)
    out2 = forward_scan_eimp_compact(model_c, stacked, data2, p=0.1)
    np.testing.assert_array_equal(np.asarray(out2["overflow0"]), [36, 0])


def test_compact_two_stage_schedule():
    b, n = 1, 256
    model_c = _model(compaction=((3, 128), (5, 64)), n_min_tokens=8)
    params = model_c.init(jax.random.PRNGKey(1))
    stacked = stack_params(params, model_c.config)
    data = _data(b, n, [60], seed=3)
    out = forward_scan_eimp_compact(model_c, stacked, data, p=0.1)
    idx_last = np.asarray(out["indices0"][-1])
    assert idx_last.shape == (1, n)  # original indexing restored
    # matched targets must be valid original indices
    m = idx_last[idx_last > -1]
    assert (m < 60).all()
    # unmatched / padded slots are -1
    assert (idx_last[:, 60:] == -1).all()


def test_compact_produce_matches_routing():
    model_c = _model(compaction=((4, 128),))
    params = model_c.init(jax.random.PRNGKey(0))
    data = _data(1, 256, [90])
    out = jax.jit(lambda p, d: model_c.produce_matches(
        p, d, p=0.1, only_last=True, with_scores=False))(params, data)
    assert out["scores"] == [None] or out["scores"][0] is None
    assert np.asarray(out["indices0"][-1]).shape == (1, 256)


def test_stable_topk_keeps_survivors_in_order():
    from impx.models.fast import _stable_topk_indices

    keep = jnp.asarray([[False, True, False, True, True, False]])
    idx = np.asarray(_stable_topk_indices(keep, 4))
    np.testing.assert_array_equal(idx[0][:3], [1, 3, 4])  # survivors, in order
    assert idx[0][3] == 0  # first non-survivor fills the slack slot
