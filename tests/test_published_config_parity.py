"""Parity vs the torch reference at the PUBLISHED eval configuration —
15 layers, dim 256, Sinkhorn 20, norm 'in', n_min_tokens 256
(reference eval/eval_imp.py:259-272) — not the toy scale of
test_model_parity.py. Weights travel through the real checkpoint path
(torch.save .pth -> load_matcher_checkpoint), and the impx side runs PADDED
(1024-bucket) with validity masks, pinning the mask/pad semantics where
bf16/fp32 and pooling interactions actually bite.

These are the heaviest CPU tests in the suite (~1-2 min each on one core).
"""
import numpy as np
import pytest
import torch

import jax.numpy as jnp

from impx.models import MatcherConfig, DGNNS, AdaGMN
from impx.tools.convert_torch import load_matcher_checkpoint

from tests.test_model_parity import _cpu_sink, _capture_final_gids

N_LAYERS = 15
DIM = 256
N0, N1 = 1000, 900       # real keypoint counts (yfcc protocol ~2000; CPU budget)
BUCKET = 1024            # impx padding bucket


@pytest.fixture()
def patched_reference(reference_path, monkeypatch):
    import nets.gm as ref_gm

    monkeypatch.setattr(ref_gm, "sink_algorithm", _cpu_sink)
    return reference_path


def _published_config():
    # MatcherConfig.eval_config mirrors reference eval/eval_imp.py:259-270
    return MatcherConfig.eval_config("spp", n_layers=N_LAYERS)


def _torch_config():
    return {
        "descriptor_dim": DIM,
        "GNN_layers": ["self", "cross"] * N_LAYERS,
        "n_layers": N_LAYERS,
        "sinkhorn_iterations": 20,
        "match_threshold": 0.2,
        "with_sinkhorn": True,
        "ac_fn": "relu",
        "norm_fn": "in",
        "n_min_tokens": 256,
    }


def _inputs(rs):
    return {
        "descriptors0": rs.randn(1, N0, DIM).astype(np.float32),
        "descriptors1": rs.randn(1, N1, DIM).astype(np.float32),
        "norm_keypoints0": (rs.rand(1, N0, 2).astype(np.float32) - 0.5),
        "norm_keypoints1": (rs.rand(1, N1, 2).astype(np.float32) - 0.5),
        "scores0": rs.rand(1, N0).astype(np.float32),
        "scores1": rs.rand(1, N1).astype(np.float32),
    }


def _torch_data(data):
    return {
        "descriptors0": torch.from_numpy(data["descriptors0"]),
        "descriptors1": torch.from_numpy(data["descriptors1"]),
        "keypoints0": torch.from_numpy(data["norm_keypoints0"]) * 100,
        "keypoints1": torch.from_numpy(data["norm_keypoints1"]) * 100,
        "norm_keypoints0": torch.from_numpy(data["norm_keypoints0"]),
        "norm_keypoints1": torch.from_numpy(data["norm_keypoints1"]),
        "scores0": torch.from_numpy(data["scores0"]),
        "scores1": torch.from_numpy(data["scores1"]),
    }


def _padded_jax_data(data):
    """Pad to the BUCKET with validity masks — the impx production layout."""
    out = {}
    for k, v in data.items():
        n = v.shape[1]
        width = [(0, 0), (0, BUCKET - n)] + [(0, 0)] * (v.ndim - 2)
        out[k] = jnp.asarray(np.pad(v, width))
    out["valid0"] = jnp.asarray(np.arange(BUCKET)[None, :] < N0)
    out["valid1"] = jnp.asarray(np.arange(BUCKET)[None, :] < N1)
    return out


def _save_and_load(tm, tmp_path, cfg, sharing=True):
    path = str(tmp_path / "published.pth")
    torch.save({"model": tm.state_dict()}, path)
    return load_matcher_checkpoint(path, cfg, sharing=sharing)


def test_dgnns_published_config_parity(patched_reference, tmp_path):
    from nets.gms import DGNNS as TorchDGNNS

    torch.manual_seed(0)
    cfg = _published_config()
    tm = TorchDGNNS(config=_torch_config()).eval()
    params = _save_and_load(tm, tmp_path, cfg)
    model = DGNNS(cfg)

    data = _inputs(np.random.RandomState(1))
    with torch.no_grad():
        ref = tm.produce_matches(_torch_data(data), p=0.2, only_last=False)
    out = model.produce_matches(params, _padded_jax_data(data), p=0.2,
                                only_last=False)

    assert len(out["indices0"]) == N_LAYERS
    for li in range(N_LAYERS):
        idx = np.asarray(out["indices0"][li])[:, :N0]
        ref_idx = ref["indices0"][li].numpy()
        np.testing.assert_array_equal(
            idx, ref_idx, err_msg=f"indices mismatch at iteration {li}")
        # padded slots must never match
        assert (np.asarray(out["indices0"][li])[:, N0:] == -1).all()
        np.testing.assert_allclose(
            np.asarray(out["mscores0"][li])[:, :N0],
            ref["mscores0"][li].numpy(), rtol=2e-4, atol=2e-4,
            err_msg=f"mscores mismatch at iteration {li}")


def test_adagmn_published_config_parity(patched_reference, tmp_path):
    """EIMP at the shipping scale: pooling REALLY fires (N >> n_min_tokens=256)
    and the surviving keep sets must equal the reference's gids exactly."""
    from nets.adgm import AdaGMN as TorchAdaGMN

    torch.manual_seed(1)
    cfg = _published_config()
    tm = TorchAdaGMN(config=_torch_config()).eval()
    params = _save_and_load(tm, tmp_path, cfg)
    model = AdaGMN(cfg)

    data = _inputs(np.random.RandomState(2))
    # with RANDOM weights the Sinkhorn rows are diffuse and every row clears
    # the production mscore_th=0.1, so nothing would pool; 0.5 makes the
    # discard rule bite the way 0.1 does with trained weights (hundreds of
    # keypoints dropped over iterations 3/5/7/...)
    th = 0.5
    with torch.no_grad():
        ref, (ref_gids0, ref_gids1) = _capture_final_gids(
            tm, _torch_data(data), p=0.2, mscore_th=th)
    out = model.produce_matches(params, _padded_jax_data(data), p=0.2,
                                mscore_th=th)

    for li in range(N_LAYERS):
        np.testing.assert_array_equal(
            np.asarray(out["indices0"][li])[:, :N0],
            ref["indices0"][li].numpy(),
            err_msg=f"indices mismatch at iteration {li}")
        np.testing.assert_allclose(
            np.asarray(out["mscores0"][li])[:, :N0],
            ref["mscores0"][li].numpy(), rtol=2e-4, atol=2e-4,
            err_msg=f"mscores mismatch at iteration {li}")

    keep0 = np.asarray(out["keep0"])[0, :N0]
    keep1 = np.asarray(out["keep1"])[0, :N1]
    # pooling must actually have discarded something at this scale for the
    # comparison to have teeth
    assert keep0.sum() < N0 or keep1.sum() < N1
    np.testing.assert_array_equal(np.flatnonzero(keep0), np.sort(ref_gids0[0]))
    np.testing.assert_array_equal(np.flatnonzero(keep1), np.sort(ref_gids1[0]))
    assert not np.asarray(out["keep0"])[0, N0:].any()
    assert not np.asarray(out["keep1"])[0, N1:].any()


def test_adagmn_fused_path_agrees_with_xla_at_depth():
    """The Pallas scan fast path (forward_scan_eimp) vs the masked XLA path
    at the published DEPTH/DIM (15 layers, dim 256, Sinkhorn 20) with pooling
    actually discarding — the bucket is shrunk to 256 (n_min_tokens 64) so
    the kernel interpreter can afford it on CPU."""
    import dataclasses

    import jax

    from impx.models import AdaGMN as ImpxAdaGMN

    n, nv0, nv1 = 256, 230, 210
    cfg = dataclasses.replace(
        MatcherConfig.eval_config("spp", n_layers=N_LAYERS), n_min_tokens=64)
    model_x = ImpxAdaGMN(cfg)
    model_f = ImpxAdaGMN(dataclasses.replace(cfg, attn_impl="pallas"))
    params = model_x.init(jax.random.PRNGKey(3))

    rs = np.random.RandomState(4)
    data = {
        "descriptors0": jnp.asarray(rs.randn(1, n, DIM), jnp.float32),
        "descriptors1": jnp.asarray(rs.randn(1, n, DIM), jnp.float32),
        "norm_keypoints0": jnp.asarray(rs.rand(1, n, 2) - 0.5, jnp.float32),
        "norm_keypoints1": jnp.asarray(rs.rand(1, n, 2) - 0.5, jnp.float32),
        "scores0": jnp.asarray(rs.rand(1, n), jnp.float32),
        "scores1": jnp.asarray(rs.rand(1, n), jnp.float32),
        "valid0": jnp.asarray(np.arange(n)[None] < nv0),
        "valid1": jnp.asarray(np.arange(n)[None] < nv1),
    }
    th = 0.5  # see above: makes the discard rule bite with random weights
    out_x = model_x.produce_matches(params, data, p=0.2, mscore_th=th)
    out_f = model_f.produce_matches(params, data, p=0.2, mscore_th=th,
                                    with_scores=False)

    kx0 = np.asarray(out_x["keep0"])
    assert kx0.sum() < nv0  # pooling fired
    np.testing.assert_array_equal(kx0, np.asarray(out_f["keep0"]))
    np.testing.assert_array_equal(np.asarray(out_x["keep1"]),
                                  np.asarray(out_f["keep1"]))
    for li in range(N_LAYERS):
        np.testing.assert_array_equal(
            np.asarray(out_x["indices0"][li]), np.asarray(out_f["indices0"][li]),
            err_msg=f"fused vs xla indices mismatch at iteration {li}")
        np.testing.assert_allclose(
            np.asarray(out_x["mscores0"][li]), np.asarray(out_f["mscores0"][li]),
            atol=1e-4, err_msg=f"fused vs xla mscores mismatch at iteration {li}")
