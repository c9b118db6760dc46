"""SuperGlue baseline parity: log-domain OT vs the reference implementation,
and full-model forward with converted weights."""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from impx.models.config import MatcherConfig
from impx.models.superglue import SuperGlue, convert_superglue_matcher
from impx.ops.sinkhorn import log_optimal_transport


def test_log_optimal_transport_parity(reference_path):
    from nets.superglue import log_optimal_transport as ref_lot

    rs = np.random.RandomState(0)
    scores = rs.randn(2, 13, 17).astype(np.float32)
    alpha = np.float32(0.9)
    ref = ref_lot(torch.from_numpy(scores), torch.tensor(alpha), iters=30).numpy()
    ours = log_optimal_transport(jnp.asarray(scores), jnp.asarray(alpha), 30)
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-4, atol=1e-4)


def test_log_ot_masked_equals_compacted():
    rs = np.random.RandomState(1)
    n, m, nv, mv = 24, 32, 13, 17
    dist_c = rs.randn(2, nv, mv).astype(np.float32)
    alpha = np.float32(0.5)
    dist = np.zeros((2, n, m), np.float32)
    dist[:, :nv, :mv] = dist_c
    valid0 = np.zeros((2, n), bool); valid0[:, :nv] = True
    valid1 = np.zeros((2, m), bool); valid1[:, :mv] = True

    full = np.asarray(log_optimal_transport(
        jnp.asarray(dist), jnp.asarray(alpha), 30, jnp.asarray(valid0), jnp.asarray(valid1)))
    comp = np.asarray(log_optimal_transport(jnp.asarray(dist_c), jnp.asarray(alpha), 30))
    np.testing.assert_allclose(full[:, :nv, :mv], comp[:, :nv, :mv], rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(full[:, :nv, -1], comp[:, :nv, -1], rtol=1e-4, atol=1e-4)
    # padded entries carry ~zero probability
    assert np.exp(full[:, nv:-1, :]).max() < 1e-6


def test_superglue_model_parity(reference_path):
    from nets.superglue import SuperGlue as TorchSG

    torch.manual_seed(0)
    cfg = MatcherConfig(descriptor_dim=64, n_layers=3, sinkhorn_iterations=20,
                        match_threshold=0.2, norm_fn="bn")
    tm = TorchSG({"descriptor_dim": 64, "layers": 3, "sinkhorn_iterations": 20,
                  "match_threshold": 0.2}).eval()
    params = convert_superglue_matcher(tm.state_dict(), cfg)
    model = SuperGlue(cfg)

    rs = np.random.RandomState(2)
    b, n = 2, 32
    data_np = {
        "descriptors0": rs.randn(b, n, 64).astype(np.float32),
        "descriptors1": rs.randn(b, n, 64).astype(np.float32),
        "norm_keypoints0": (rs.rand(b, n, 2) - 0.5).astype(np.float32),
        "norm_keypoints1": (rs.rand(b, n, 2) - 0.5).astype(np.float32),
        "scores0": rs.rand(b, n).astype(np.float32),
        "scores1": rs.rand(b, n).astype(np.float32),
    }
    tdata = {k: torch.from_numpy(v) for k, v in data_np.items()}
    tdata["keypoints0"] = tdata["norm_keypoints0"] * 100
    tdata["keypoints1"] = tdata["norm_keypoints1"] * 100
    with torch.no_grad():
        _, _, ref_scores, _ = tm.forward_train(tdata)

    desc0, desc1, v0, v1 = model._encode_inputs(
        params, {k: jnp.asarray(v) for k, v in data_np.items()})
    state = model.init_state()
    for i in range(len(params["gnn"])):
        desc0, desc1, state = model.forward_one_layer(params, desc0, desc1, i, state)
        if i % 2 == 1:
            li = i // 2
            dist = model.compute_distance(params, desc0, desc1)
            score = model.compute_score(params, dist)
            np.testing.assert_allclose(
                np.asarray(score), ref_scores[li].numpy(), rtol=2e-3, atol=2e-4,
                err_msg=f"OT scores mismatch at iteration {li}")
