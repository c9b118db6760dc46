"""End-to-end AUC harness (VERDICT item: real-data AUC parity is untestable in
this environment — this is the mitigation): train a small matcher on synthetic
scenes, dump a synthetic "YFCC-like" eval HDF5 with known ground-truth poses,
then drive the ACTUAL eval driver (impx.eval.eval_imp.evaluate: reader ->
padding -> produce_matches -> precision/pose AUC accumulation) in both
non-iterative and batched-iterative modes and assert the pose AUC clears a
floor. Exercises the full published protocol path minus the dataset."""
import argparse

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from impx.data.reader import StandardReader
from impx.data.synthetic import write_eval_hdf5
from impx.data.megadepth import SyntheticMegadepth
from impx.models import MatcherConfig, DGNNS
from impx.train.step import (TrainHyperParams, make_train_step, make_optimizer,
                             init_stats)
from impx.eval.eval_imp import evaluate

N_KPTS = 128
DIM = 32


@pytest.fixture(scope="module")
def trained_model():
    cfg = MatcherConfig(descriptor_dim=DIM, keypoint_encoder=(16, 32), n_layers=6,
                        sinkhorn_iterations=10, norm_fn="in", n_min_tokens=16)
    model = DGNNS(cfg)
    params = model.init(jax.random.PRNGKey(0))
    hp = TrainHyperParams(lr=5e-4, decay_iter=10_000)
    step = make_train_step(model, hp, donate=False)
    opt_state = make_optimizer(hp).init(params)
    ds = SyntheticMegadepth(num_pairs=96, nfeatures=N_KPTS, desc_dim=DIM, seed=0)
    batches = []
    for b in range(6):
        samples = [ds[b * 16 + i] for i in range(16)]
        batches.append({k: jnp.asarray(np.stack([s[k] for s in samples]).astype(np.float32))
                        for k in samples[0] if isinstance(samples[0][k], np.ndarray)})
    for it in range(300):
        params, opt_state, _, _ = step(params, opt_state, jnp.asarray(it),
                                       batches[it % len(batches)], init_stats())
    return model, params


@pytest.fixture(scope="module")
def synth_reader(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("e2e") / "synth_eval.hdf5")
    write_eval_hdf5(path, num_pairs=12, seed=7, n_inliers=80,
                    n_outliers0=48, n_outliers1=48, desc_dim=DIM)
    return StandardReader({"rawdata_dir": "/tmp", "dataset_dir": path,
                           "num_kpt": N_KPTS})


def _args(**over):
    base = dict(max_pairs=-1, bucket=N_KPTS, use_iterative=False,
                use_uncertainty=False, pose_backend="jax", eval_batch=4)
    base.update(over)
    return argparse.Namespace(**base)


def test_eval_driver_noniterative_auc(trained_model, synth_reader):
    model, params = trained_model
    res = evaluate(model, params, synth_reader, error_th=1.0,
                   eval_config={"rescale": 640, "inlier_th": 0.005}, args=_args())
    # trained matcher + on-device RANSAC on clean synthetic scenes: the pose
    # should be recovered well within 20 degrees for most pairs
    assert res["auc"][20] > 40.0, res
    assert res["precision"] > 50.0, res


def test_eval_driver_batched_iterative_auc(trained_model, synth_reader):
    model, params = trained_model
    res = evaluate(model, params, synth_reader, error_th=1.0,
                   eval_config={"rescale": 640, "inlier_th": 0.005},
                   args=_args(use_iterative=True))
    assert res["auc"][20] > 40.0, res
    # early stopping engaged for at least some pairs
    assert res["mean_stop_iteration"] <= model.config.n_layers, res
