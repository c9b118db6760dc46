"""End-to-end numerical parity of GM / DGNNS / AdaGMN against the reference
PyTorch models (random weights converted with impx.tools.convert_torch).

The reference's non-log Sinkhorn hardcodes device='cuda' (nets/layers.py:41-43),
so tests monkeypatch it with a device-agnostic restatement of the same math.
"""
import numpy as np
import pytest
import torch

import jax.numpy as jnp

from impx.models import MatcherConfig, GM, DGNNS, AdaGMN
from impx.tools.convert_torch import convert_matcher

RTOL, ATOL = 1e-4, 1e-4

N_LAYERS = 5
N_KPTS = 48
BATCH = 2
DIM = 64


def _cpu_sink(M, dustbin, iteration):
    eps = 1e-8
    M = torch.cat([M, dustbin.expand([M.shape[0], M.shape[1], 1])], dim=-1)
    M = torch.cat([M, dustbin.expand([M.shape[0], 1, M.shape[2]])], dim=-2)
    r = torch.ones([M.shape[0], M.shape[1] - 1])
    r = torch.cat([r, torch.ones([M.shape[0], 1]) * M.shape[1]], dim=-1)
    c = torch.ones([M.shape[0], M.shape[2] - 1])
    c = torch.cat([c, torch.ones([M.shape[0], 1]) * M.shape[2]], dim=-1)
    p = torch.softmax(M, dim=-1)
    u, v = torch.ones_like(r), torch.ones_like(c)
    for _ in range(iteration):
        u = r / ((p * v.unsqueeze(-2)).sum(-1) + eps)
        v = c / ((p * u.unsqueeze(-1)).sum(-2) + eps)
    return p * u.unsqueeze(-1) * v.unsqueeze(-2)


@pytest.fixture()
def patched_reference(reference_path, monkeypatch):
    import nets.gm as ref_gm

    monkeypatch.setattr(ref_gm, "sink_algorithm", _cpu_sink)
    return reference_path


def _config(n_layers=N_LAYERS):
    return MatcherConfig(
        descriptor_dim=DIM, n_layers=n_layers, sinkhorn_iterations=20,
        match_threshold=0.2, ac_fn="relu", norm_fn="in", n_min_tokens=16,
    )


def _torch_config(cfg: MatcherConfig):
    return {
        "descriptor_dim": cfg.descriptor_dim,
        "GNN_layers": ["self", "cross"] * cfg.n_layers,
        "n_layers": cfg.n_layers,
        "sinkhorn_iterations": cfg.sinkhorn_iterations,
        "match_threshold": cfg.match_threshold,
        "with_sinkhorn": True,
        "ac_fn": cfg.ac_fn,
        "norm_fn": cfg.norm_fn,
        "n_min_tokens": cfg.n_min_tokens,
    }


def _random_inputs(rs, n0=N_KPTS, n1=N_KPTS):
    return {
        "descriptors0": rs.randn(BATCH, n0, DIM).astype(np.float32),
        "descriptors1": rs.randn(BATCH, n1, DIM).astype(np.float32),
        "norm_keypoints0": (rs.rand(BATCH, n0, 2).astype(np.float32) - 0.5),
        "norm_keypoints1": (rs.rand(BATCH, n1, 2).astype(np.float32) - 0.5),
        "scores0": rs.rand(BATCH, n0).astype(np.float32),
        "scores1": rs.rand(BATCH, n1).astype(np.float32),
    }


def _torch_data(data):
    return {
        "descriptors0": torch.from_numpy(data["descriptors0"]),
        "descriptors1": torch.from_numpy(data["descriptors1"]),
        # reference models read data['keypoints0'] unconditionally (gms.py:142)
        # even when norm_keypoints are supplied; values unused beyond shape
        "keypoints0": torch.from_numpy(data["norm_keypoints0"]) * 100,
        "keypoints1": torch.from_numpy(data["norm_keypoints1"]) * 100,
        "norm_keypoints0": torch.from_numpy(data["norm_keypoints0"]),
        "norm_keypoints1": torch.from_numpy(data["norm_keypoints1"]),
        "scores0": torch.from_numpy(data["scores0"]),
        "scores1": torch.from_numpy(data["scores1"]),
    }


def _jax_data(data):
    return {k: jnp.asarray(v) for k, v in data.items()}


def test_dgnns_produce_matches_parity(patched_reference):
    from nets.gms import DGNNS as TorchDGNNS

    torch.manual_seed(0)
    cfg = _config()
    tm = TorchDGNNS(config=_torch_config(cfg)).eval()
    params = convert_matcher(tm.state_dict(), cfg, sharing=True)
    model = DGNNS(cfg)

    data = _random_inputs(np.random.RandomState(1))
    with torch.no_grad():
        ref = tm.produce_matches(_torch_data(data), p=0.2, only_last=False)
    out = model.produce_matches(params, _jax_data(data), p=0.2, only_last=False)

    assert len(out["indices0"]) == cfg.n_layers
    for li in range(cfg.n_layers):
        np.testing.assert_array_equal(
            np.asarray(out["indices0"][li]), ref["indices0"][li].numpy(),
            err_msg=f"indices mismatch at iteration {li}")
        np.testing.assert_allclose(
            np.asarray(out["mscores0"][li]), ref["mscores0"][li].numpy(),
            rtol=RTOL, atol=ATOL)


def test_dgnns_masked_equals_compacted(patched_reference):
    """Padding + masks must reproduce the exact un-padded forward."""
    torch.manual_seed(0)
    cfg = _config()
    from nets.gms import DGNNS as TorchDGNNS

    tm = TorchDGNNS(config=_torch_config(cfg)).eval()
    params = convert_matcher(tm.state_dict(), cfg, sharing=True)
    model = DGNNS(cfg)

    rs = np.random.RandomState(2)
    n0v, n1v, n_pad = 33, 41, 64
    data = _random_inputs(rs, n0=n0v, n1=n1v)
    out_c = model.produce_matches(params, _jax_data(data), p=0.2, only_last=True)

    padded = {}
    for k, v in data.items():
        pad = n_pad - v.shape[1]
        width = [(0, 0), (0, pad)] + [(0, 0)] * (v.ndim - 2)
        padded[k] = np.pad(v, width)
    padded = _jax_data(padded)
    padded["valid0"] = jnp.asarray(np.arange(n_pad)[None, :] < n0v).repeat(BATCH, 0)
    padded["valid1"] = jnp.asarray(np.arange(n_pad)[None, :] < n1v).repeat(BATCH, 0)
    out_p = model.produce_matches(params, padded, p=0.2, only_last=True)

    idx_c = np.asarray(out_c["indices0"][-1])
    idx_p = np.asarray(out_p["indices0"][-1])[:, :n0v]
    np.testing.assert_array_equal(idx_p, idx_c)
    assert (np.asarray(out_p["indices0"][-1])[:, n0v:] == -1).all()
    np.testing.assert_allclose(
        np.asarray(out_p["mscores0"][-1])[:, :n0v],
        np.asarray(out_c["mscores0"][-1]), rtol=RTOL, atol=ATOL)


def test_gm_forward_train_loss_parity(patched_reference):
    from nets.gm import GM as TorchGM

    torch.manual_seed(1)
    cfg = _config(n_layers=3)
    tcfg = _torch_config(cfg)
    tcfg["GNN_layers"] = ["self", "cross"] * cfg.n_layers
    tm = TorchGM(config=tcfg).train()
    params = convert_matcher(tm.state_dict(), cfg, sharing=False)
    model = GM(cfg)

    rs = np.random.RandomState(3)
    data = _random_inputs(rs)
    # random GT assignment: diagonal matches for the first half, rest unmatched
    gt = np.zeros((BATCH, N_KPTS + 1, N_KPTS + 1), np.float32)
    half = N_KPTS // 2
    gt[:, np.arange(half), np.arange(half)] = 1
    gt[:, np.arange(half, N_KPTS), -1] = 1
    gt[:, -1, np.arange(half, N_KPTS)] = 1

    tdata = _torch_data(data)
    tdata["matching_mask"] = torch.from_numpy(gt)
    with torch.no_grad():
        ref = tm.forward_train(tdata)
    jdata = _jax_data(data)
    jdata["matching_mask"] = jnp.asarray(gt)
    out = model.forward_train(params, jdata, train=False)
    np.testing.assert_allclose(float(out["loss"]), float(ref["loss"]), rtol=1e-4)
    np.testing.assert_allclose(
        float(out["matching_loss_corr"]), float(ref["matching_loss_corr"]), rtol=1e-4)
    np.testing.assert_allclose(
        float(out["matching_loss_incorr"]), float(ref["matching_loss_incorr"]), rtol=1e-4)


def test_adagmn_produce_matches_parity(patched_reference):
    """EIMP: masked pooling must reproduce the reference's index-gather pooling,
    including the surviving keypoint sets."""
    from nets.adgm import AdaGMN as TorchAdaGMN

    torch.manual_seed(2)
    cfg = _config()  # n_min_tokens=16 so pooling actually triggers at N=48
    tm = TorchAdaGMN(config=_torch_config(cfg)).eval()
    params = convert_matcher(tm.state_dict(), cfg, sharing=True)
    model = AdaGMN(cfg)

    data = _random_inputs(np.random.RandomState(4))
    with torch.no_grad():
        ref, (ref_gids0, ref_gids1) = _capture_final_gids(
            tm, _torch_data(data), p=0.2, mscore_th=0.1)
    out = model.produce_matches(params, _jax_data(data), p=0.2, mscore_th=0.1)

    for li in range(cfg.n_layers):
        np.testing.assert_array_equal(
            np.asarray(out["indices0"][li]), ref["indices0"][li].numpy(),
            err_msg=f"indices mismatch at iteration {li}")
        np.testing.assert_allclose(
            np.asarray(out["mscores0"][li]), ref["mscores0"][li].numpy(),
            rtol=RTOL, atol=ATOL, err_msg=f"mscores mismatch at iteration {li}")

    # direct keep-set parity: the reference's final surviving global ids
    # (locals all_gids0/all_gids1 in adgm.py:produce_matches) must equal the
    # set bits of impx's final keep masks, per batch element and side
    keep0 = np.asarray(out["keep0"])
    keep1 = np.asarray(out["keep1"])
    assert len(ref_gids0) == BATCH and len(ref_gids1) == BATCH
    for bi in range(BATCH):
        np.testing.assert_array_equal(
            np.flatnonzero(keep0[bi]), np.sort(ref_gids0[bi]),
            err_msg=f"keep-set mismatch image0 batch {bi}")
        np.testing.assert_array_equal(
            np.flatnonzero(keep1[bi]), np.sort(ref_gids1[bi]),
            err_msg=f"keep-set mismatch image1 batch {bi}")


def _capture_final_gids(tm, tdata, **kwargs):
    """Run the reference produce_matches and capture its final all_gids0/1
    locals (the surviving-keypoint global ids) via a frame trace — the
    reference never returns them (adgm.py:516-526)."""
    import sys

    captured = {}

    def tracer(frame, event, arg):
        if event == "call" and frame.f_code.co_name == "produce_matches":
            return local_tracer
        return None

    def local_tracer(frame, event, arg):
        if event == "return" and "all_gids0" in frame.f_locals:
            captured["gids0"] = [g.numpy().copy() for g in frame.f_locals["all_gids0"]]
            captured["gids1"] = [g.numpy().copy() for g in frame.f_locals["all_gids1"]]
        return local_tracer

    old = sys.gettrace()
    sys.settrace(tracer)
    try:
        out = tm.produce_matches(tdata, **kwargs)
    finally:
        sys.settrace(old)
    assert "gids0" in captured, "trace hook failed to capture all_gids0"
    return out, (captured["gids0"], captured["gids1"])
