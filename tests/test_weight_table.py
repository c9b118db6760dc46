"""Strict-load coverage for the FULL reference weight table.

The reference ships eight checkpoint names (eval/eval_imp.py:274-333):
{IMP, IMP_geo, EIMP, EIMP_geo} x {spp (dim 256), sift (dim 128)} — all at the
published 15-layer / Sinkhorn-20 / n_min_tokens-256 architecture (the _geo
variants differ only in training, not shape). No published checkpoint exists
in this environment, so this is the strongest in-env converter validation:
for every table entry, synthesize a torch checkpoint of the exact reference
architecture under the table's filename, load it through impx's converter,
reverse-convert, STRICT-load into a fresh reference model, and require the
round trip to be bit-exact.
"""
import numpy as np
import pytest
import torch

import jax

from impx.eval.eval_imp import WEIGHT_TABLE, build_model
from impx.tools.convert_torch import (convert_matcher, load_matcher_checkpoint,
                                      matcher_state_dict)

METHODS = ["IMP", "IMP_geo", "EIMP", "EIMP_geo"]
FEATS = ["spp", "sift"]


def _torch_model(method, feat, reference_path):
    # published eval config, reference eval/eval_imp.py:255-271
    config = {
        "descriptor_dim": 256 if feat == "spp" else 128,
        "sinkhorn_iterations": 20,
        "match_threshold": 0.2,
        "with_sinkhorn": True,
        "n_layers": 15,
        "GNN_layers": ["self", "cross"] * 15,
        "ac_fn": "relu",
        "norm_fn": "in",
        "n_min_tokens": 256,
    }
    if method.startswith("EIMP"):
        from nets.adgm import AdaGMN as TorchAdaGMN

        return TorchAdaGMN(config=config)
    from nets.gms import DGNNS as TorchDGNNS

    return TorchDGNNS(config=config)


@pytest.mark.parametrize("feat", FEATS)
@pytest.mark.parametrize("method", METHODS)
def test_weight_table_strict_roundtrip(method, feat, reference_path, tmp_path):
    torch.manual_seed(hash((method, feat)) % 2**31)
    tm = _torch_model(method, feat, reference_path)

    # save under the exact name eval_imp would look up (yfcc column; the
    # scannet column shares names except the _geo_spp pair, covered below)
    name = WEIGHT_TABLE[method][feat]["yfcc"]
    path = tmp_path / name
    torch.save({"model": tm.state_dict(), "epoch": 1}, path)

    model = build_model(method, feat)
    assert model.config.descriptor_dim == (256 if feat == "spp" else 128)
    params = load_matcher_checkpoint(str(path), model.config, model.sharing)

    # every leaf present and finite
    leaves = jax.tree.leaves(params)
    assert leaves and all(np.isfinite(np.asarray(x)).all() for x in leaves)

    # reverse-convert and STRICT-load into a fresh reference model: every
    # key must exist with the right shape
    state = matcher_state_dict(params, model.config, model.sharing)
    tm2 = _torch_model(method, feat, reference_path)
    tm2.load_state_dict(state, strict=True)

    back = convert_matcher(tm2.state_dict(), model.config, model.sharing)
    lb = jax.tree.leaves(back)
    assert len(leaves) == len(lb)
    for a, b in zip(leaves, lb):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_weight_table_covers_reference_names():
    """The CLI's table must carry the reference's exact filenames for every
    (method, feat, dataset) cell — including the distinct _geo_spp per-dataset
    checkpoints (reference eval/eval_imp.py:274-333; its 'imp_geo_sift.pthh'
    scannet entry is an obvious typo we normalize to .pth)."""
    expected = {
        ("IMP", "spp", "yfcc"): "imp_spp.pth",
        ("IMP", "spp", "scannet"): "imp_spp.pth",
        ("IMP", "sift", "yfcc"): "imp_sift.pth",
        ("IMP", "sift", "scannet"): "imp_sift.pth",
        ("IMP_geo", "spp", "yfcc"): "imp_geo_spp_yfcc.pth",
        ("IMP_geo", "spp", "scannet"): "imp_geo_spp_scannet.pth",
        ("IMP_geo", "sift", "yfcc"): "imp_geo_sift.pth",
        ("IMP_geo", "sift", "scannet"): "imp_geo_sift.pth",
        ("EIMP", "spp", "yfcc"): "eimp_spp.pth",
        ("EIMP", "spp", "scannet"): "eimp_spp.pth",
        ("EIMP", "sift", "yfcc"): "eimp_sift.pth",
        ("EIMP", "sift", "scannet"): "eimp_sift.pth",
        ("EIMP_geo", "spp", "yfcc"): "eimp_geo_spp_yfcc.pth",
        ("EIMP_geo", "spp", "scannet"): "eimp_geo_spp_scannet.pth",
        ("EIMP_geo", "sift", "yfcc"): "eimp_geo_sift.pth",
        ("EIMP_geo", "sift", "scannet"): "eimp_geo_sift.pth",
    }
    for (method, feat, ds), name in expected.items():
        assert WEIGHT_TABLE[method][feat][ds] == name, (method, feat, ds)
