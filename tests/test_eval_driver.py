"""The eval CLI path end-to-end on synthetic data (tiny, CPU)."""
import numpy as np
import pytest


def test_eval_imp_driver(tmp_path):
    from impx.data.synthetic import write_eval_hdf5
    from impx.data.reader import StandardReader
    from impx.eval.eval_imp import build_model, evaluate
    import jax

    ds = write_eval_hdf5(str(tmp_path / "synth.hdf5"), num_pairs=2, seed=0,
                         n_inliers=48, n_outliers0=48, n_outliers1=48, desc_dim=64)
    reader = StandardReader({"rawdata_dir": str(tmp_path), "dataset_dir": ds,
                             "num_kpt": 96})

    model = build_model("IMP", "spp", n_layers=3)
    # shrink to a CPU-friendly model
    import dataclasses

    model.config = dataclasses.replace(
        model.config, descriptor_dim=64, keypoint_encoder=(16, 32))
    params = model.init(jax.random.PRNGKey(0))

    class Args:
        use_iterative = False
        use_uncertainty = False
        pose_backend = "jax"
        max_pairs = 2
        bucket = 128

    results = evaluate(model, params, reader, error_th=1.0,
                       eval_config={"rescale": 640, "inlier_th": 0.005}, args=Args())
    assert set(results) >= {"auc", "precision", "matching_score",
                            "pairs_per_sec_device"}
    assert np.isfinite(results["precision"])
    assert results["mean_stop_iteration"] == 3.0


def test_evaluate_full_driver(tmp_path):
    from impx.data.synthetic import write_eval_hdf5
    from impx.eval.eval_full import evaluate_full
    from impx.eval.eval_imp import build_model
    import dataclasses
    import jax

    ds = write_eval_hdf5(str(tmp_path / "synth.hdf5"), num_pairs=2, seed=1,
                         n_inliers=48, n_outliers0=48, n_outliers1=48, desc_dim=64)
    model = build_model("IMP", "spp", n_layers=3)
    model.config = dataclasses.replace(
        model.config, descriptor_dim=64, keypoint_encoder=(16, 32))
    params = model.init(jax.random.PRNGKey(0))

    opt = {"reader": {"rawdata_dir": str(tmp_path), "dataset_dir": ds, "num_kpt": 96},
           "evaluator": {"rescale": 640, "inlier_th": 0.005, "ransac_th": 1.0,
                         "pose_backend": "jax"}}
    out = evaluate_full(model, params, opt, dataset="yfcc", max_pairs=2)
    assert set(out) == {"auc5", "auc10", "auc15", "auc20", "prec", "mscore"}


def test_eval_data_parallel_matches_single_device(tmp_path):
    """--data_parallel shards the eval batch over the 8-device CPU mesh;
    results must equal the single-device run exactly."""
    from impx.data.synthetic import write_eval_hdf5
    from impx.data.reader import StandardReader
    from impx.eval.eval_imp import build_model, evaluate
    import dataclasses
    import jax

    ds = write_eval_hdf5(str(tmp_path / "synth.hdf5"), num_pairs=8, seed=2,
                         n_inliers=48, n_outliers0=48, n_outliers1=48, desc_dim=64)
    reader = StandardReader({"rawdata_dir": str(tmp_path), "dataset_dir": ds,
                             "num_kpt": 96})
    model = build_model("IMP", "spp", n_layers=3)
    model.config = dataclasses.replace(
        model.config, descriptor_dim=64, keypoint_encoder=(16, 32))
    params = model.init(jax.random.PRNGKey(0))

    class Args:
        use_iterative = False
        use_uncertainty = False
        pose_backend = "jax"
        max_pairs = 8
        bucket = 128
        eval_batch = 8
        data_parallel = False

    single = evaluate(model, params, reader, error_th=1.0,
                      eval_config={"rescale": 640, "inlier_th": 0.005}, args=Args())
    Args.data_parallel = True
    assert len(jax.devices()) == 8
    sharded = evaluate(model, params, reader, error_th=1.0,
                       eval_config={"rescale": 640, "inlier_th": 0.005}, args=Args())
    assert sharded["auc"] == single["auc"]
    np.testing.assert_allclose(sharded["precision"], single["precision"], rtol=1e-6)
    np.testing.assert_allclose(sharded["matching_score"], single["matching_score"],
                               rtol=1e-6)


def test_eval_data_parallel_iterative_matches_single_device(tmp_path):
    """--data_parallel now also shards the batched ITERATIVE loop (every op
    in BatchedIterativeMatcher.run_batch is batch-parallel; the all-converged
    scalar becomes an XLA all-reduce). 8-device CPU mesh == single device."""
    from impx.data.synthetic import write_eval_hdf5
    from impx.data.reader import StandardReader
    from impx.eval.eval_imp import build_model, evaluate
    import dataclasses
    import jax

    ds = write_eval_hdf5(str(tmp_path / "synth.hdf5"), num_pairs=8, seed=3,
                         n_inliers=48, n_outliers0=48, n_outliers1=48, desc_dim=64)
    reader = StandardReader({"rawdata_dir": str(tmp_path), "dataset_dir": ds,
                             "num_kpt": 96})
    model = build_model("IMP", "spp", n_layers=3)
    model.config = dataclasses.replace(
        model.config, descriptor_dim=64, keypoint_encoder=(16, 32))
    params = model.init(jax.random.PRNGKey(0))

    class Args:
        use_iterative = True
        use_uncertainty = False
        pose_backend = "jax"
        max_pairs = 8
        bucket = 128
        eval_batch = 8
        data_parallel = False

    single = evaluate(model, params, reader, error_th=1.0,
                      eval_config={"rescale": 640, "inlier_th": 0.005}, args=Args())
    Args.data_parallel = True
    assert len(jax.devices()) == 8
    sharded = evaluate(model, params, reader, error_th=1.0,
                       eval_config={"rescale": 640, "inlier_th": 0.005}, args=Args())
    assert sharded["auc"] == single["auc"]
    np.testing.assert_allclose(sharded["precision"], single["precision"], rtol=1e-6)
    np.testing.assert_allclose(sharded["matching_score"], single["matching_score"],
                               rtol=1e-6)
