"""Pipelined evaluate_full (reference eval_yfcc_full.py:74-221 handlers)
must produce results identical to the serial driver."""
import dataclasses

import numpy as np


def _setup(tmp_path, num_pairs=6):
    from impx.data.synthetic import write_eval_hdf5
    from impx.eval.eval_imp import build_model
    import jax

    ds = write_eval_hdf5(str(tmp_path / "synth.hdf5"), num_pairs=num_pairs,
                         seed=3, n_inliers=48, n_outliers0=48, n_outliers1=48,
                         desc_dim=64)
    model = build_model("IMP", "spp", n_layers=3)
    model.config = dataclasses.replace(
        model.config, descriptor_dim=64, keypoint_encoder=(16, 32))
    params = model.init(jax.random.PRNGKey(0))
    opt = {"reader": {"rawdata_dir": str(tmp_path), "dataset_dir": ds,
                      "num_kpt": 96},
           "evaluator": {"rescale": 640, "inlier_th": 0.005, "ransac_th": 1.0,
                         "pose_backend": "jax"}}
    return model, params, opt


def test_pipelined_matches_serial(tmp_path):
    from impx.eval.eval_full import evaluate_full
    from impx.eval.pipeline import evaluate_full_pipelined

    model, params, opt = _setup(tmp_path, num_pairs=6)
    serial = evaluate_full(model, params, opt, dataset="yfcc", max_pairs=6)
    # batch 4 over 6 pairs exercises the repeated-tail final batch
    piped = evaluate_full_pipelined(model, params, opt, dataset="yfcc",
                                    max_pairs=6, batch_size=4, eval_workers=2)
    assert set(piped) == set(serial)
    for k in serial:
        assert np.isclose(piped[k], serial[k], atol=1e-9), (k, piped[k], serial[k])


def test_pipelined_short_run(tmp_path):
    """max_pairs smaller than one batch still works (tail-only path)."""
    from impx.eval.pipeline import evaluate_full_pipelined

    model, params, opt = _setup(tmp_path, num_pairs=6)
    out = evaluate_full_pipelined(model, params, opt, dataset="yfcc",
                                  max_pairs=2, batch_size=4)
    assert np.isfinite(out["prec"])
