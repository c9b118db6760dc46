"""Pipelined full evaluation — the overlapped reader→matcher→evaluator
pipeline (reference eval/eval_yfcc_full.py:74-221: `reader_handler` feeding a
queue, `match_handler` matching cached batches of 4 through a Pool(4),
`evaluate_handler` scoring through a second Pool(4); dead code in the
reference — its `evaluate_full` runs serially).

TPU-native redesign of the same three-stage shape:

  reader thread   : HDF5 reads + bucket padding + size normalization for a
                    whole BATCH of pairs at a time (the reference's cache of
                    4), staged into a bounded prefetch queue so host IO
                    overlaps device compute.
  matcher (main)  : ONE jitted batched `produce_matches` per feed — the
                    matcher stage is a single device program over the batch
                    instead of a host process pool around per-pair calls.
                    JAX dispatch is async, so while the device crunches batch
                    k the main thread is already unpacking batch k-1 and the
                    reader thread is staging batch k+1.
  evaluator pool  : per-pair RANSAC + metrics submitted to a thread pool
                    (cv2's USAC releases the GIL, so threads give the Pool(4)
                    parallelism without pickling); results are drained in
                    submission order, so the metric accumulation is
                    bit-identical to the serial `evaluate_full`.

`evaluate_full_pipelined` returns exactly the same dict as
`impx.eval.eval_full.evaluate_full` and is tested equal to it.
"""
from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor

import numpy as np
import jax
import jax.numpy as jnp

from impx.data.reader import StandardReader, pad_features, round_up
from impx.eval.evaluator import AucEval


def _normalize_kpts(x, size_wh):
    """feed_match_v2 size normalization (eval_yfcc_full.py:30-36)."""
    size = np.asarray(size_wh, np.float32).reshape(1, 2)
    return (x - size / 2.0 - 0.5) / (size.max() * 0.7)


def _stage_batch(reader: StandardReader, indices, bucket: int):
    """Read + pad + normalize a batch of pairs; returns (feed, infos).

    The feed is stacked numpy (host-side) — the device transfer happens on
    the main thread via jnp.asarray so this function is safe off-thread.
    """
    feats, infos = [], []
    for index in indices:
        info = reader.run(index)
        x0, d0, v0 = pad_features(info["x1"], info["desc1"], bucket)
        x1, d1, v1 = pad_features(info["x2"], info["desc2"], bucket)
        size1 = info.get("img_size1", (480, 640))
        size2 = info.get("img_size2", (480, 640))
        norm0 = _normalize_kpts(x0[:, :2], [size1[1], size1[0]])
        norm1 = _normalize_kpts(x1[:, :2], [size2[1], size2[0]])
        feats.append((x0, d0, v0, norm0, x1, d1, v1, norm1))
        infos.append(info)
    # Repeat the last pair to fill a short final batch: one jit shape total.
    n_real = len(feats)
    while len(feats) < len(indices) or not feats:
        feats.append(feats[-1])
    feed = {
        "descriptors0": np.stack([f[1] for f in feats]),
        "descriptors1": np.stack([f[5] for f in feats]),
        "norm_keypoints0": np.stack([f[3] for f in feats]),
        "norm_keypoints1": np.stack([f[7] for f in feats]),
        "scores0": np.stack([f[0][:, 2] for f in feats]),
        "scores1": np.stack([f[4][:, 2] for f in feats]),
        "valid0": np.stack([f[2] for f in feats]),
        "valid1": np.stack([f[6] for f in feats]),
    }
    raw = [(f[0], f[4]) for f in feats[:n_real]]
    return feed, infos, raw


def evaluate_full_pipelined(model, params, opt: dict, dataset: str = "yfcc",
                            feat_type: str = "spp", max_pairs: int = -1,
                            batch_size: int = 4, prefetch: int = 3,
                            eval_workers: int = 4) -> dict:
    """Three-stage overlapped evaluate_full; results equal the serial driver."""
    reader = StandardReader(opt[dataset]["reader"] if dataset in opt else opt["reader"])
    eval_cfg = opt[dataset]["evaluator"] if dataset in opt else opt["evaluator"]
    evaluator = AucEval(eval_cfg)
    bucket = round_up(reader.num_kpt, 128)
    n = len(reader) if max_pairs < 0 else min(max_pairs, len(reader))
    th = eval_cfg.get("ransac_th", 1.0)

    produce_fn = jax.jit(lambda p, d: model.produce_matches(
        p, d, p=model.config.match_threshold, only_last=True))

    staged: "queue.Queue" = queue.Queue(maxsize=prefetch)

    def reader_loop():
        try:
            for start in range(0, n, batch_size):
                indices = list(range(start, min(start + batch_size, n)))
                # pad the index list so every feed has one static batch shape
                full = indices + [indices[-1]] * (batch_size - len(indices))
                staged.put((_stage_batch(reader, full, bucket), len(indices)))
        except Exception as exc:  # surface reader errors on the main thread
            staged.put(exc)
        staged.put(None)

    t = threading.Thread(target=reader_loop, daemon=True)
    t.start()

    futures = []
    with ThreadPoolExecutor(max_workers=eval_workers) as pool:
        while True:
            item = staged.get()
            if item is None:
                break
            if isinstance(item, Exception):
                raise item
            (feed_np, infos, raw), n_real = item
            feed = {k: jnp.asarray(v) for k, v in feed_np.items()}
            out = produce_fn(params, feed)
            indices0 = np.asarray(out["indices0"][-1])  # [B, bucket]
            for b in range(n_real):
                info = infos[b]
                x0, x1 = raw[b]
                idx = indices0[b]
                valid = idx > -1
                corr1 = x0[valid, :2]
                corr2 = x1[np.clip(idx[valid], 0, bucket - 1), :2]
                payload = {
                    "e": info["e"], "r_gt": info["r_gt"], "t_gt": info["t_gt"],
                    "K1": info["K1"], "K2": info["K2"],
                    "corr1": corr1, "corr2": corr2,
                    "n_kpts1": len(info["x1"]),
                }
                futures.append(pool.submit(evaluator.run, payload, th=th))
        # drain in submission order -> accumulation identical to serial
        for fut in futures:
            evaluator.res_inqueue(fut.result())

    t.join()
    parsed = evaluator.parse()
    exact = parsed["exact_auc"]
    return {
        "auc5": 100 * exact[0], "auc10": 100 * exact[1],
        "auc15": 100 * exact[2], "auc20": 100 * exact[3],
        "prec": parsed["mean_precision"],
        "mscore": parsed["mean_match_score"],
    }
