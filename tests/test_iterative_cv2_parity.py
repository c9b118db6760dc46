"""Byte-exact parity of impx's cv2-checkpoint iterative loop against the
reference's `matching_iterative` (eval/matching.py:16-123).

This is the CI-sized guard for the round-4 divergence-isolation result
(STATUS.md): with the reference's own host cv2 USAC_MAGSAC at every
checkpoint, impx's layer stepping, match extraction, pose-diff stop logic
and p=0.2 fallback must reproduce the reference bit for bit — matches, stop
iteration, convergence flag and pose. The full-size version (48 pairs,
trained weights) is `python -m impx.eval.cross_study --iterative-only
--checkpoint-backend cv2`; here: random seeded weights, 15 layers at dim 64,
64 keypoints, 2 synthetic pairs.
"""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from impx.models import MatcherConfig, DGNNS
from impx.tools.convert_torch import convert_matcher

from tests.test_model_parity import _cpu_sink, _torch_config

DIM = 64
N_KPTS = 64
N_LAYERS = 15  # the checkpoint schedule (3,5,...,14) assumes 15 iterations
MIN_KPTS = 5


@pytest.fixture()
def patched_reference(reference_path, monkeypatch):
    import nets.gm as ref_gm

    monkeypatch.setattr(ref_gm, "sink_algorithm", _cpu_sink)
    return reference_path


def _pair(rs):
    from impx.data.synthetic import synthesize_pair

    return synthesize_pair(rs, n_inliers=N_KPTS // 2,
                           n_outliers0=N_KPTS // 2, n_outliers1=N_KPTS // 2,
                           desc_dim=DIM)


def _norm_kpts(pts, h, w, scale=0.7):
    size = np.array([w, h], np.float32)
    return ((pts - size / 2.0) / (size.max() * scale)).astype(np.float32)


def test_iterative_cv2_checkpoints_match_reference(patched_reference):
    cv2 = pytest.importorskip("cv2")
    import sys

    sys.path.insert(0, str(patched_reference))
    from nets.gms import DGNNS as TorchDGNNS
    import eval.matching as refmatching

    from impx.eval.iterative import IterativeMatcher

    torch.manual_seed(0)
    cfg = MatcherConfig(
        descriptor_dim=DIM, n_layers=N_LAYERS, sinkhorn_iterations=10,
        match_threshold=0.2, ac_fn="relu", norm_fn="in", n_min_tokens=16,
    )
    tm = TorchDGNNS(config=_torch_config(cfg)).eval()
    params = convert_matcher(tm.state_dict(), cfg, sharing=True)
    model = DGNNS(cfg)
    matcher = IterativeMatcher(model, params, norm_thresh=1.0 / 600.0,
                               match_ratio=0.1, min_kpts=MIN_KPTS,
                               checkpoint_backend="cv2")

    rs = np.random.RandomState(11)
    for pi in range(2):
        pair = _pair(rs)
        h, w = pair["img_size1"]
        k0 = pair["kpt1"][:, :2]
        k1 = pair["kpt2"][:, :2]
        nk0 = _norm_kpts(k0, h, w)
        nk1 = _norm_kpts(k1, h, w)
        K0 = np.asarray(pair["K1"], np.float64)
        K1 = np.asarray(pair["K2"], np.float64)
        T = np.hstack([pair["R"], np.asarray(pair["T"]).reshape(3, 1)])
        d0 = pair["desc1"].astype(np.float32)
        d1 = pair["desc2"].astype(np.float32)
        s0 = pair["kpt1"][:, 2]
        s1 = pair["kpt2"][:, 2]

        tdata = {
            "keypoints0": torch.from_numpy(k0).float()[None],
            "keypoints1": torch.from_numpy(k1).float()[None],
            "norm_keypoint0": torch.from_numpy(nk0)[None],
            "norm_keypoint1": torch.from_numpy(nk1)[None],
            "norm_keypoints0": torch.from_numpy(nk0)[None],
            "norm_keypoints1": torch.from_numpy(nk1)[None],
            "scores0": torch.from_numpy(s0).float()[None],
            "scores1": torch.from_numpy(s1).float()[None],
            # matching_iterative transposes to [1, D, N] itself (matching.py:30)
            "descriptors0": torch.from_numpy(d0)[None],
            "descriptors1": torch.from_numpy(d1)[None],
            "pts0_cpu": k0, "pts1_cpu": k1,
            "K0": K0, "K1": K1, "T_0to1": T,
            "image0": torch.zeros(1, h, w), "image1": torch.zeros(1, h, w),
        }
        with torch.no_grad():
            ref_idx0, ref_ms0, ref_R, ref_t, ref_stop = \
                refmatching.matching_iterative(
                    data=tdata, model=tm, nI=N_LAYERS, match_ratio=0.1,
                    min_kpts=MIN_KPTS, error_th=1.0,
                    stop_criteria={"match": 0.7, "pose": 1.5},
                    method=cv2.USAC_MAGSAC)

        feed = {
            "descriptors0": jnp.asarray(d0)[None],
            "descriptors1": jnp.asarray(d1)[None],
            "norm_keypoints0": jnp.asarray(nk0)[None],
            "norm_keypoints1": jnp.asarray(nk1)[None],
            "scores0": jnp.asarray(s0)[None].astype(jnp.float32),
            "scores1": jnp.asarray(s1)[None].astype(jnp.float32),
            "valid0": jnp.ones((1, len(k0)), bool),
            "valid1": jnp.ones((1, len(k1)), bool),
            "x0n": jnp.asarray((k0 - K0[:2, 2]) / np.diag(K0)[:2]),
            "x1n": jnp.asarray((k1 - K1[:2, 2]) / np.diag(K1)[:2]),
            # pixel coords, raw reader dtype — exactly the reference's inputs
            "x0px": np.ascontiguousarray(k0),
            "x1px": np.ascontiguousarray(k1),
            "K0": K0, "K1": K1, "error_th_px": 1.0,
        }
        out = matcher.run(feed, jax.random.PRNGKey(pi))

        np.testing.assert_array_equal(
            np.asarray(out["indices0"]), np.asarray(ref_idx0),
            err_msg=f"pair {pi}: final match indices diverge")
        assert out["stopped_at"] == ref_stop, (
            f"pair {pi}: stop iteration {out['stopped_at']} vs {ref_stop}")
        assert out["converged"] == (ref_R is not None), pi
        if ref_R is not None:
            np.testing.assert_allclose(np.asarray(out["R"]), ref_R, atol=1e-5)
            np.testing.assert_allclose(np.asarray(out["t"]).ravel(),
                                       np.asarray(ref_t).ravel(), atol=1e-5)
