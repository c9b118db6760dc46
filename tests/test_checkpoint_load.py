"""Reference .pth checkpoint loading end-to-end (torch.save -> converter ->
identical matches) and the reference-style forward dispatch API."""
import numpy as np
import torch

import jax
import jax.numpy as jnp

from impx.models import MatcherConfig, DGNNS
from impx.tools.convert_torch import convert_matcher, load_matcher_checkpoint


def _cfg():
    return MatcherConfig(descriptor_dim=64, n_layers=3, sinkhorn_iterations=10,
                         norm_fn="in", n_min_tokens=16)


def _data(rs, b=1, n=32, d=64):
    return {
        "descriptors0": jnp.asarray(rs.randn(b, n, d), jnp.float32),
        "descriptors1": jnp.asarray(rs.randn(b, n, d), jnp.float32),
        "norm_keypoints0": jnp.asarray(rs.rand(b, n, 2) - 0.5, jnp.float32),
        "norm_keypoints1": jnp.asarray(rs.rand(b, n, 2) - 0.5, jnp.float32),
        "scores0": jnp.asarray(rs.rand(b, n), jnp.float32),
        "scores1": jnp.asarray(rs.rand(b, n), jnp.float32),
    }


def test_pth_checkpoint_roundtrip(reference_path, tmp_path, monkeypatch):
    from nets.gms import DGNNS as TorchDGNNS

    torch.manual_seed(0)
    cfg = _cfg()
    tm = TorchDGNNS(config={
        "descriptor_dim": 64, "GNN_layers": ["self", "cross"] * 3, "n_layers": 3,
        "sinkhorn_iterations": 10, "match_threshold": 0.2, "with_sinkhorn": True,
        "ac_fn": "relu", "norm_fn": "in", "n_min_tokens": 16})
    path = tmp_path / "imp_test.pth"
    torch.save({"model": tm.state_dict(), "epoch": 3}, path)

    model = DGNNS(cfg)
    params_file = load_matcher_checkpoint(str(path), cfg, sharing=True)
    params_direct = convert_matcher(tm.state_dict(), cfg, sharing=True)
    for a, b in zip(jax.tree.leaves(params_file), jax.tree.leaves(params_direct)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    data = _data(np.random.RandomState(0))
    out = model.produce_matches(params_file, data, p=0.2, only_last=True)
    assert np.asarray(out["indices0"][-1]).shape == (1, 32)


def test_reverse_converter_roundtrip(reference_path):
    """impx params -> torch state_dict -> convert back == identity, and the
    reference model accepts the state_dict strictly (every key present,
    every shape right)."""
    from nets.gms import DGNNS as TorchDGNNS

    from impx.tools.convert_torch import matcher_state_dict

    cfg = _cfg()
    model = DGNNS(cfg)
    params = model.init(jax.random.PRNGKey(7))
    state = matcher_state_dict(params, cfg, sharing=True)

    tm = TorchDGNNS(config={
        "descriptor_dim": 64, "GNN_layers": ["self", "cross"] * 3, "n_layers": 3,
        "sinkhorn_iterations": 10, "match_threshold": 0.2, "with_sinkhorn": True,
        "ac_fn": "relu", "norm_fn": "in", "n_min_tokens": 16})
    tm.load_state_dict(state, strict=True)

    back = convert_matcher(tm.state_dict(), cfg, sharing=True)
    la, lb = jax.tree.leaves(params), jax.tree.leaves(back)
    assert len(la) == len(lb)
    for a, b in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_call_dispatch_api():
    """Reference forward(data, mode) semantics (gm.py:252-258)."""
    cfg = _cfg()
    model = DGNNS(cfg)
    params = model.init(jax.random.PRNGKey(0))
    rs = np.random.RandomState(1)
    data = _data(rs)

    out0 = model(params, data, mode=0)
    assert "indices0" in out0

    run_data = {
        "desc1": data["descriptors0"], "desc2": data["descriptors1"],
        "x1": jnp.concatenate([data["norm_keypoints0"],
                               data["scores0"][..., None]], -1),
        "x2": jnp.concatenate([data["norm_keypoints1"],
                               data["scores1"][..., None]], -1),
    }
    out1 = model(params, run_data, mode=1)
    assert "indices0" in out1

    data_t = dict(data)
    n = data["scores0"].shape[1]
    mask = np.zeros((1, n + 1, n + 1), np.float32)
    mask[:, np.arange(n), np.arange(n)] = 1
    data_t["matching_mask"] = jnp.asarray(mask)
    out_t = model(params, data_t, training=True)
    assert np.isfinite(float(out_t["loss"]))
