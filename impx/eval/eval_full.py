"""In-training full evaluation (reference eval/eval_yfcc_full.py).

`evaluate_full(model, params, opt, dataset, feat_type)`: iterate a
standard_reader HDF5, run the matcher via the SGMNet-style `run()` API with
size-normalized keypoints (feed_match_v2 semantics, eval_yfcc_full.py:23-71:
kpts normalized by image size with scale 0.7, handles both score-matrix and
index outputs), score with AucEval, return auc@5/10/15/20 + precision +
matching score. Called by the trainer every 5 epochs (reference trainer.py:262).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from impx.data.reader import StandardReader, pad_features, round_up
from impx.eval.evaluator import AucEval


def feed_match(model, params, info, bucket: int, produce_fn):
    """Reference feed_match_v2 (eval_yfcc_full.py:23-71): normalize kpts by
    image size (scale 0.7), call model.run-equivalent, return matched pairs."""
    x0, d0, v0 = pad_features(info["x1"], info["desc1"], bucket)
    x1, d1, v1 = pad_features(info["x2"], info["desc2"], bucket)
    size1 = info.get("img_size1", (480, 640))
    size2 = info.get("img_size2", (480, 640))
    def _norm(x, size_wh):
        size = np.asarray(size_wh, np.float32).reshape(1, 2)
        return (x - size / 2.0 - 0.5) / (size.max() * 0.7)

    norm0 = _norm(x0[:, :2], [size1[1], size1[0]])
    norm1 = _norm(x1[:, :2], [size2[1], size2[0]])

    feed = {
        "descriptors0": jnp.asarray(d0)[None],
        "descriptors1": jnp.asarray(d1)[None],
        "norm_keypoints0": jnp.asarray(norm0)[None],
        "norm_keypoints1": jnp.asarray(norm1)[None],
        "scores0": jnp.asarray(x0[:, 2])[None],
        "scores1": jnp.asarray(x1[:, 2])[None],
        "valid0": jnp.asarray(v0)[None],
        "valid1": jnp.asarray(v1)[None],
    }
    out = produce_fn(params, feed)
    indices0 = np.asarray(out["indices0"][-1][0])
    valid = indices0 > -1
    corr1 = x0[valid, :2]
    corr2 = x1[np.clip(indices0[valid], 0, bucket - 1), :2]
    return corr1, corr2


def evaluate_full(model, params, opt: dict, dataset: str = "yfcc",
                  feat_type: str = "spp", max_pairs: int = -1) -> dict:
    reader = StandardReader(opt[dataset]["reader"] if dataset in opt else opt["reader"])
    eval_cfg = opt[dataset]["evaluator"] if dataset in opt else opt["evaluator"]
    evaluator = AucEval(eval_cfg)
    bucket = round_up(reader.num_kpt, 128)
    n = len(reader) if max_pairs < 0 else min(max_pairs, len(reader))

    produce_fn = jax.jit(lambda p, d: model.produce_matches(
        p, d, p=model.config.match_threshold, only_last=True))

    for index in range(n):
        info = reader.run(index)
        corr1, corr2 = feed_match(model, params, info, bucket, produce_fn)
        res = evaluator.run({
            "e": info["e"], "r_gt": info["r_gt"], "t_gt": info["t_gt"],
            "K1": info["K1"], "K2": info["K2"],
            "corr1": corr1, "corr2": corr2, "n_kpts1": len(info["x1"]),
        }, th=eval_cfg.get("ransac_th", 1.0))
        evaluator.res_inqueue(res)

    parsed = evaluator.parse()
    exact = parsed["exact_auc"]
    return {
        "auc5": 100 * exact[0], "auc10": 100 * exact[1],
        "auc15": 100 * exact[2], "auc20": 100 * exact[3],
        "prec": parsed["mean_precision"],
        "mscore": parsed["mean_match_score"],
    }
