"""SuperPoint parity vs the reference torch implementation (random weights)."""
import numpy as np
import pytest
import torch

import jax.numpy as jnp

from impx.models import superpoint as sp
from impx.tools.convert_torch import convert_superpoint


@pytest.fixture()
def torch_superpoint(reference_path, monkeypatch):
    from nets.superpoint import SuperPoint as TorchSP

    # the reference constructor force-loads superpoint_v1.pth (superpoint.py:139-140);
    # neutralize it so we can test with random weights
    monkeypatch.setattr(torch, "load", lambda *a, **k: {})
    monkeypatch.setattr(torch.nn.Module, "load_state_dict",
                        lambda self, sd, **k: None)
    torch.manual_seed(0)
    tm = TorchSP({"weight_path": "unused", "max_keypoints": 64,
                  "keypoint_threshold": 0.0025}).eval()
    monkeypatch.undo()
    return tm


def test_dense_extract_parity(torch_superpoint):
    tm = torch_superpoint
    params = convert_superpoint(tm.state_dict())
    rs = np.random.RandomState(0)
    img = rs.rand(1, 64, 48).astype(np.float32)

    with torch.no_grad():
        ref_scores, ref_desc = tm.extract({"image": torch.from_numpy(img)[None]})
    scores, desc = sp.backbone(params, jnp.asarray(img)[..., None])

    np.testing.assert_allclose(np.asarray(scores), ref_scores.numpy()[0][None],
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(desc).transpose(0, 3, 1, 2),
                               ref_desc.numpy(), rtol=1e-4, atol=1e-5)


def test_nms_parity(torch_superpoint):
    from nets.superpoint import simple_nms as ref_nms

    rs = np.random.RandomState(1)
    scores = rs.rand(2, 40, 40).astype(np.float32)
    ref = ref_nms(torch.from_numpy(scores), 4).numpy()
    ours = np.asarray(sp.simple_nms(jnp.asarray(scores), 4))
    np.testing.assert_allclose(ours, ref, rtol=1e-6, atol=1e-7)


def test_keypoint_extraction_parity(torch_superpoint):
    """Fixed-K top-k extraction selects the same keypoints (as a set) and
    descriptors as the reference ragged pipeline."""
    tm = torch_superpoint
    params = convert_superpoint(tm.state_dict())
    rs = np.random.RandomState(2)
    img = rs.rand(1, 64, 64).astype(np.float32)

    with torch.no_grad():
        ref = tm({"image": torch.from_numpy(img)[None]})
    ref_kpts = ref["keypoints"][0].numpy()
    ref_scores = ref["scores"][0].numpy()
    ref_desc = ref["descriptors"][0].numpy().T  # [N, D]

    out = sp.extract_keypoints(params, jnp.asarray(img)[..., None],
                               max_keypoints=64, keypoint_threshold=0.0025)
    valid = np.asarray(out["valid"][0])
    kpts = np.asarray(out["keypoints"][0])[valid]
    scores = np.asarray(out["scores"][0])[valid]
    descs = np.asarray(out["descriptors"][0])[valid]

    # same set of keypoints (order may differ within equal scores)
    ref_set = {tuple(k) for k in ref_kpts.astype(int)}
    our_set = {tuple(k) for k in kpts.astype(int)}
    # reference keeps all above threshold; ours caps at 64 — compare the top-64
    order = np.argsort(-ref_scores)[:64]
    ref_top = {tuple(k) for k in ref_kpts[order].astype(int)}
    assert our_set == ref_top or our_set == ref_set

    # descriptor parity at shared keypoints
    ref_map = {tuple(k.astype(int)): (s, d) for k, s, d in zip(ref_kpts, ref_scores, ref_desc)}
    checked = 0
    for k, s, d in zip(kpts, scores, descs):
        key = tuple(k.astype(int))
        if key in ref_map:
            rs_, rd = ref_map[key]
            np.testing.assert_allclose(s, rs_, rtol=1e-4, atol=1e-5)
            np.testing.assert_allclose(d, rd, rtol=1e-3, atol=1e-4)
            checked += 1
    assert checked >= min(10, len(kpts))
