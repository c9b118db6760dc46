"""Cross-framework end-to-end equivalence study: the REFERENCE's own eval
stack vs impx on the same synthetic HDF5 with the same (converted) weights.

This is the strongest real-data-parity mitigation available in this
container (no YFCC/ScanNet dumps, no published checkpoints): drive the
reference's `eval/eval_imp.py:35-227` loop — its reader
(components/readers.py:8-39), its `matching_iterative`
(eval/matching.py:16-123), its `estimate_pose` cv2 USAC_MAGSAC
(eval/pose_estimation.py:92-115) and its metric accumulation — on CPU over
a synthetic standard-layout HDF5, with weights that round-trip through
torch.save -> impx.tools.convert_torch.load_matcher_checkpoint; then run
`impx.eval.eval_imp.evaluate` on the identical inputs and compare AUC@5/10/20
and the per-pair match sets.

Reference quirks handled here (not bugs in impx):
  * nets/layers.py:41-43 hardcodes device='cuda' in sink_algorithm — replaced
    with the device-agnostic restatement used by the parity tests;
  * the reference's ITERATIVE path normalizes keypoints from an HWC image
    shape as if it were NCHW (eval/eval_imp.py:63 passes img0[None] un-
    permuted; nets/layers.py:51 unpacks `_, _, height, width`), i.e. it
    divides by (3, W) instead of (W, H). Its own `matching_iterative` accepts
    caller-provided normalized keypoints (and checks the TYPO'd key
    'norm_keypoint0', eval/matching.py:20), so this study injects the
    correctly-normalized keypoints under both spellings for BOTH frameworks —
    comparing matchers, not the reference's shape-unpacking slip;
  * in UNCERTAINTY mode the reference's driver rebinds norm_pts0/1 to the
    SIZE-normalized keypoints returned by matching_iterative_uncertainty
    (eval/eval_imp.py:96/126-130) and feeds them to compute_epi_inlier
    against E, which expects INTRINSIC-normalized coordinates — its reported
    precision/matching_score in that mode are computed under the wrong
    normalization (~2% instead of ~20%). Its pose AUC is unaffected (poses
    come from the pixel keypoints). Expect the refP column to collapse on
    _unc rows; that is the reference's own behavior, faithfully driven.

Usage: python -m impx.eval.cross_study [--pairs 8] [--num-kpt 512]
"""
from __future__ import annotations

import argparse
import contextlib
import io
import os
import re
import sys
import tempfile

import numpy as np


def _cpu_sink(M, dustbin, iteration):
    """Device-agnostic reference sink_algorithm (nets/layers.py:27-46)."""
    import torch

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


def _train_params(cfg, steps: int, train_kpts: int = 256, batch: int = 4):
    """Briefly train the 15-layer DGNNS on synthetic matchable scenes (CPU)
    so the cross-framework comparison runs on weights that produce
    non-trivial match sets (random weights match almost nothing, which would
    make 'identical matches' a hollow statement). Same recipe as
    bench_suite's trained-iterative config (lr 3e-4 + clip, no decay) — at
    lr 1e-4 the deep 15-layer matcher barely moves off the ~5.5 random-init
    NLL in a few hundred steps."""
    import jax
    import jax.numpy as jnp

    from impx.data.megadepth import SyntheticMegadepth
    from impx.models import DGNNS
    from impx.train.step import (TrainHyperParams, init_stats, make_optimizer,
                                 make_train_step)

    model = DGNNS(cfg)
    params = model.init(jax.random.PRNGKey(0))
    hp = TrainHyperParams(lr=3e-4, decay_iter=10**6, grad_clip=1.0)
    step = jax.jit(make_train_step(model, hp, donate=False))
    opt_state = make_optimizer(hp).init(params)
    import numpy as np_

    ds = SyntheticMegadepth(num_pairs=32, nfeatures=train_kpts,
                            desc_dim=cfg.descriptor_dim, seed=5)
    batches = []
    for bi in range(32 // batch):
        samples = [ds[bi * batch + i] for i in range(batch)]
        batches.append({k: jnp.asarray(np_.stack([s[k] for s in samples]),
                                       jnp.float32)
                        for k in samples[0]
                        if isinstance(samples[0][k], np_.ndarray)})
    for it in range(steps):
        params, opt_state, metrics, _ = step(
            params, opt_state, jnp.asarray(it), batches[it % len(batches)],
            init_stats())
        if (it + 1) % max(steps // 5, 1) == 0:
            print(f"[cross_study train {it + 1}/{steps}] "
                  f"loss {float(metrics['loss']):.3f}", flush=True)
    return params


def _build_models(matching_method: str, seed: int, weight_dir: str,
                  train_steps: int = 0, feature: str = "spp"):
    """Reference torch model (eval config, seeded init) + impx twin through
    the .pth converter. Uses a real published checkpoint instead when one is
    present in weights/ (none ship in this container); with train_steps > 0,
    briefly-trained impx weights flow to the torch model through the REVERSE
    converter (matcher_state_dict) and back through the forward converter —
    both conversion directions are on the tested path."""
    import torch

    sys.path.insert(0, "/root/reference")
    from nets.gms import DGNNS as TorchDGNNS
    from nets.adgm import AdaGMN as TorchAdaGMN

    from impx.models import MatcherConfig, DGNNS, AdaGMN
    from impx.tools.convert_torch import (load_matcher_checkpoint,
                                          matcher_state_dict)

    dim = 256 if feature == "spp" else 128
    tcfg = {
        "descriptor_dim": dim,
        "GNN_layers": ["self", "cross"] * 15,
        "n_layers": 15,
        "sinkhorn_iterations": 20,
        "match_threshold": 0.2,
        "with_sinkhorn": True,
        "ac_fn": "relu",
        "norm_fn": "in",
        "n_min_tokens": 256,
    }
    torch.manual_seed(seed)
    tm = (TorchDGNNS if matching_method == "IMP" else TorchAdaGMN)(config=tcfg).eval()

    cfg = MatcherConfig.eval_config(feature, n_layers=15)

    published = os.path.join(
        "weights", f"{'imp' if matching_method == 'IMP' else 'eimp'}_{feature}.pth")
    if os.path.isfile(published):
        tm.load_state_dict(torch.load(published, map_location="cpu")["model"])
        pth = published
        print(f"[cross_study] using published checkpoint {published}")
    elif train_steps > 0:
        # method-independent (AdaGMN shares the DGNNS param structure) but
        # feature-dependent (descriptor dim differs)
        suffix = "" if feature == "spp" else f"_{feature}"
        pth = os.path.join(weight_dir, f"cross_trained{suffix}.pth")
        if not os.path.isfile(pth):
            trained = _train_params(cfg, train_steps)
            torch.save({"model": matcher_state_dict(trained, cfg, sharing=True)},
                       pth)
        tm.load_state_dict(
            torch.load(pth, map_location="cpu")["model"], strict=True)
        print(f"[cross_study] impx-trained ({train_steps} steps) weights via "
              f"the reverse converter: {pth}")
    else:
        pth = os.path.join(weight_dir, f"cross_{matching_method}.pth")
        torch.save({"model": tm.state_dict()}, pth)
        print(f"[cross_study] no published checkpoint; seeded random weights "
              f"round-tripped through {pth}")
    params = load_matcher_checkpoint(pth, cfg, sharing=True)
    model = (DGNNS if matching_method == "IMP" else AdaGMN)(cfg)
    return tm, model, params


@contextlib.contextmanager
def _reference_on_cpu():
    import torch

    old_t, old_m = torch.Tensor.cuda, torch.nn.Module.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    import nets.gm as ref_gm

    old_sink = ref_gm.sink_algorithm
    ref_gm.sink_algorithm = _cpu_sink
    try:
        yield
    finally:
        torch.Tensor.cuda, torch.nn.Module.cuda = old_t, old_m
        ref_gm.sink_algorithm = old_sink


def _norm_kpts(pts, h, w, scale=0.7):
    size = np.array([w, h], np.float32)
    return (pts - size / 2.0) / (size.max() * scale)


def run_reference(h5_path, image_dir, tm, use_iterative, max_pairs,
                  num_kpt=512, error_th=1.0, use_uncertainty=False):
    """Drive the reference's own eval() with its module globals set up; parse
    its printed results; capture per-pair matches via method wrappers.

    With use_uncertainty the reference runs `matching_iterative_uncertainty`
    (eval/matching.py:126-276), which physically SLICES the keypoint arrays
    between iterations — its returned match indices live in the pooled index
    space, so this mode captures matched COORDINATE pairs [x0,y0,x1,y1]
    instead of index arrays (compare with coord_set_agreement)."""
    import torch

    import eval.eval_imp as refmod
    import eval.matching as refmatching

    reader = refmod.standard_reader(config={
        "rawdata_dir": image_dir, "dataset_dir": h5_path, "num_kpt": num_kpt})
    n = min(max_pairs, len(reader))

    class _Limited:
        def __len__(self):
            return n

        def run(self, index):
            return reader.run(index)

    limited = _Limited()
    captured = []
    stops, conv = [], []  # per-pair stop iteration + converged flag (iterative)

    old_pm = type(tm).produce_matches
    old_mi = refmod.matching_iterative
    old_miu = refmod.matching_iterative_uncertainty

    def wrapped_pm(self, data, **kw):
        out = old_pm(self, data, **kw)
        captured.append(out["indices0"][-1][0].detach().cpu().numpy().copy())
        return out

    def wrapped_mi(data=None, **kw):
        # inject correctly-normalized keypoints under BOTH spellings (the
        # reference checks 'norm_keypoint0' but reads 'norm_keypoints0',
        # eval/matching.py:20-22) — see module docstring
        h, w = data["image0"].shape[1:3]
        nk0 = torch.from_numpy(
            _norm_kpts(data["pts0_cpu"], h, w)).float()[None]
        nk1 = torch.from_numpy(
            _norm_kpts(data["pts1_cpu"], h, w)).float()[None]
        data = dict(data, norm_keypoint0=nk0, norm_keypoint1=nk1,
                    norm_keypoints0=nk0, norm_keypoints1=nk1)
        out = old_mi(data=data, **kw)
        captured.append(np.asarray(out[0]).copy())
        # out = (indices0, mscores0, R, t, stop_iteration); R is None when
        # the pose-diff criterion never fired (reference matching.py:110-123)
        stops.append(int(out[4]))
        conv.append(out[2] is not None)
        return out

    def wrapped_miu(data=None, **kw):
        # same norm-keypoint injection as wrapped_mi (see module docstring)
        h, w = data["image0"].shape[1:3]
        nk0 = torch.from_numpy(
            _norm_kpts(data["pts0_cpu"], h, w)).float()[None]
        nk1 = torch.from_numpy(
            _norm_kpts(data["pts1_cpu"], h, w)).float()[None]
        data = dict(data, norm_keypoint0=nk0, norm_keypoint1=nk1,
                    norm_keypoints0=nk0, norm_keypoints1=nk1)
        out = old_miu(data=data, **kw)
        pts0_r, pts1_r = np.asarray(out[0]), np.asarray(out[1])
        matches = np.asarray(out[4])
        valid = matches > -1
        coords = np.hstack([pts0_r[valid][:, :2],
                            pts1_r[matches[valid]][:, :2]])
        captured.append(coords)
        # out = (pts0, pts1, norm0, norm1, indices0, mscores0, R, t, stop)
        stops.append(int(out[8]))
        conv.append(out[6] is not None)
        return out

    refmod.reader = limited
    refmod.reader_loader = limited
    refmod.nI = 15
    refmod.eval_config = {"rescale": 1600, "inlier_th": 0.005}
    refmod.use_iterative = use_iterative
    refmod.use_uncertainty = use_uncertainty
    refmod.error_th = error_th
    refmod.net = tm
    refmod.matching_iterative = wrapped_mi
    refmod.matching_iterative_uncertainty = wrapped_miu
    type(tm).produce_matches = wrapped_pm

    buf = io.StringIO()
    try:
        with _reference_on_cpu(), torch.no_grad(), \
                contextlib.redirect_stdout(buf):
            refmod.eval(model=tm)
    finally:
        type(tm).produce_matches = old_pm
        refmod.matching_iterative = old_mi
        refmod.matching_iterative_uncertainty = old_miu

    text = buf.getvalue()
    rows = re.findall(
        r"^(-?[\d.]+)\t (-?[\d.]+)\t (-?[\d.]+)\t (-?[\d.]+)\t (-?[\d.]+)\t "
        r"(-?[\d.]+)\t\s*$", text, re.M)
    assert rows, f"could not parse reference eval output:\n{text[-2000:]}"
    auc5, auc10, auc20, auc50, prec, ms = map(float, rows[-1])
    return {"auc": {5: auc5, 10: auc10, 20: auc20, 50: auc50},
            "precision": prec, "matching_score": ms, "matches": captured,
            "stops": stops, "converged": conv}


def run_impx(h5_path, model, params, use_iterative, pose_backend, max_pairs,
             num_kpt=512, use_uncertainty=False, checkpoint_backend="jax"):
    from impx.eval import eval_imp as ie

    reader = ie.StandardReader({"rawdata_dir": None, "dataset_dir": h5_path,
                                "num_kpt": num_kpt})
    args = argparse.Namespace(
        use_iterative=use_iterative, use_uncertainty=use_uncertainty,
        pose_backend=pose_backend, eval_batch=1 if use_iterative else 4,
        bucket=num_kpt, max_pairs=max_pairs, data_parallel=False,
        checkpoint_backend=checkpoint_backend)

    captured = []
    stops, conv = [], []
    old_sp = ie._score_pair

    from impx.eval.iterative import IterativeMatcher

    old_run = IterativeMatcher.run

    def wrapped_run(self, data, key, norm_thresh=None):
        out = old_run(self, data, key, norm_thresh=norm_thresh)
        stops.append(int(out["stopped_at"]))
        conv.append(bool(out["converged"]))
        return out

    def wrapped_sp(info, x0, x1, matches, *a, **kw):
        if use_uncertainty:
            # impx keeps global indices under pooling (keep-masks, no
            # slicing) — capture matched coordinate pairs to compare with
            # the reference's pooled-index-space output
            m = np.asarray(matches)
            valid = m > -1
            captured.append(np.hstack([np.asarray(x0)[valid][:, :2],
                                       np.asarray(x1)[m[valid]][:, :2]]))
        else:
            captured.append(np.asarray(matches).copy())
        return old_sp(info, x0, x1, matches, *a, **kw)

    ie._score_pair = wrapped_sp
    IterativeMatcher.run = wrapped_run
    try:
        results = ie.evaluate(model, params, reader, 1.0,
                              {"rescale": 1600, "inlier_th": 0.005}, args)
    finally:
        ie._score_pair = old_sp
        IterativeMatcher.run = old_run
    results["matches"] = captured
    results["stops"] = stops
    results["converged"] = conv
    return results


def match_set_agreement(ref_matches, impx_matches):
    """Per-pair fraction of identical match decisions (index arrays compared
    elementwise over the first num_kpt slots). Also returns the positive-
    match Jaccard (set overlap of (i, m[i]) pairs with m[i] > -1) — the
    stricter statistic comparable with uncertainty mode's coord Jaccard."""
    fracs, jacc, exact = [], [], 0
    for a, b in zip(ref_matches, impx_matches):
        n = min(len(a), len(b))
        fracs.append(np.mean(a[:n] == b[:n]))
        sa = {(i, int(v)) for i, v in enumerate(a[:n]) if v > -1}
        sb = {(i, int(v)) for i, v in enumerate(b[:n]) if v > -1}
        union = len(sa | sb)
        jacc.append(len(sa & sb) / union if union else 1.0)
        exact += bool((a[:n] == b[:n]).all())
    return float(np.mean(fracs)), exact, len(fracs), float(np.mean(jacc))


def coord_set_agreement(ref_coords, impx_coords):
    """Per-pair Jaccard overlap of matched-coordinate sets [x0,y0,x1,y1]
    (used for uncertainty mode, where the two frameworks report matches in
    different index spaces)."""
    ious, exact = [], 0
    for a, b in zip(ref_coords, impx_coords):
        sa = {tuple(v) for v in np.round(a, 2)}
        sb = {tuple(v) for v in np.round(b, 2)}
        union = len(sa | sb)
        ious.append(len(sa & sb) / union if union else 1.0)
        exact += sa == sb
    return float(np.mean(ious)), exact, len(ious), float(np.mean(ious))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=8)
    ap.add_argument("--num-kpt", type=int, default=512)
    ap.add_argument("--methods", nargs="+", default=["IMP", "EIMP"])
    ap.add_argument("--feature", choices=["spp", "sift"], default="spp",
                    help="eval configuration family: spp (dim 256) or sift "
                         "(dim 128, reference eval/eval_imp.py:262)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--train-steps", type=int, default=0,
                    help="briefly train impx weights first (reverse-converted "
                         "to torch) so match sets are non-trivial")
    ap.add_argument("--weight-dir", type=str, default="",
                    help="directory for cross_trained.pth — pass a fixed path "
                         "to reuse the trained weights across study runs")
    ap.add_argument("--iterative-only", action="store_true", default=False,
                    help="skip the (already-exact) non-iterative modes")
    ap.add_argument("--checkpoint-backend", choices=["jax", "cv2", "both"],
                    default="jax",
                    help="pose solver at impx's iterative checkpoints: cv2 "
                         "runs host USAC_MAGSAC inside impx's loop exactly "
                         "like the reference (eval/matching.py:84-87) — the "
                         "experiment that isolates matcher divergence from "
                         "the designed-in backend swap")
    ap.add_argument("--ref-repeats", type=int, default=1,
                    help="run the REFERENCE eval this many times on identical "
                         "inputs in non-iterative modes and report the "
                         "run-to-run AUC spread — brackets how much of any "
                         "AUC delta is cv2 MAGSAC sampling jitter")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")  # hermetic: torch vs impx on CPU

    from impx.tools.compile_cache import enable as enable_compile_cache

    enable_compile_cache()  # the 15-layer CPU compile dominates startup

    from impx.data.synthetic import write_eval_hdf5

    tmp = tempfile.mkdtemp(prefix="cross_study_")
    image_dir = os.path.join(tmp, "images")
    h5 = write_eval_hdf5(os.path.join(tmp, "synth.hdf5"), num_pairs=args.pairs,
                         seed=args.seed, image_dir=image_dir,
                         n_inliers=args.num_kpt // 2,
                         n_outliers0=args.num_kpt // 2,
                         n_outliers1=args.num_kpt // 2,
                         desc_dim=256 if args.feature == "spp" else 128)

    rows = []
    weight_dir = args.weight_dir or tmp
    if args.weight_dir:
        os.makedirs(args.weight_dir, exist_ok=True)
    for method in args.methods:
        tm, model, params = _build_models(method, args.seed, weight_dir,
                                          train_steps=args.train_steps,
                                          feature=args.feature)
        # (iterative, uncertainty) modes; uncertainty pooling only exists on
        # AdaGMN (DGNNS.pool is a no-op, reference gms.py:316-317)
        modes = [(True, False)] if args.iterative_only else [(False, False),
                                                             (True, False)]
        if method == "EIMP":
            modes.append((True, True))
        for iterative, uncertainty in modes:
            ref = run_reference(h5, image_dir, tm, iterative, args.pairs,
                                args.num_kpt, use_uncertainty=uncertainty)
            if args.ref_repeats > 1 and not iterative:
                # identical inputs + weights through the same loop again:
                # match sets must be bit-identical (torch is deterministic),
                # so any AUC spread is cv2 MAGSAC run-to-run jitter
                aucs = {k: [ref["auc"][k]] for k in (5, 10, 20)}
                for _ in range(args.ref_repeats - 1):
                    ref2 = run_reference(h5, image_dir, tm, iterative,
                                         args.pairs, args.num_kpt,
                                         use_uncertainty=uncertainty)
                    same = all(
                        np.array_equal(a, b)
                        for a, b in zip(ref["matches"], ref2["matches"]))
                    for k in (5, 10, 20):
                        aucs[k].append(ref2["auc"][k])
                spread = {k: round(max(v) - min(v), 2)
                          for k, v in aucs.items()}
                print(f"[jitter] {method} non-iterative: ref x"
                      f"{args.ref_repeats} runs, match sets identical="
                      f"{same}, AUC@5/10/20 values "
                      f"{[aucs[k] for k in (5, 10, 20)]} spread {spread}",
                      flush=True)
            # (pose_backend for the evaluator/fallback, checkpoint_backend):
            # the ckpt-cv2 isolation experiment also routes the fallback pose
            # through cv2 so EVERY solver call matches the reference's loop
            if not iterative:
                variants = [("cv2", "jax"), ("jax", "jax")]
            elif args.checkpoint_backend == "both":
                variants = [("jax", "jax"), ("cv2", "cv2")]
            elif args.checkpoint_backend == "cv2":
                variants = [("cv2", "cv2")]
            else:
                variants = [("jax", "jax")]
            for backend, ckpt in variants:
                imp = run_impx(h5, model, params, iterative, backend,
                               args.pairs, args.num_kpt,
                               use_uncertainty=uncertainty,
                               checkpoint_backend=ckpt)
                agree = (coord_set_agreement if uncertainty
                         else match_set_agreement)
                frac, exact, total, jacc = agree(ref["matches"], imp["matches"])
                row = {
                    "method": method, "iterative": iterative,
                    "uncertainty": uncertainty,
                    "impx_pose": (f"ckpt-{ckpt}" if iterative else backend),
                    "ref_auc": [ref["auc"][k] for k in (5, 10, 20)],
                    "impx_auc": [round(imp["auc"][k], 2) for k in (5, 10, 20)],
                    "ref_prec": ref["precision"],
                    "impx_prec": round(imp["precision"], 2),
                    "match_agree": round(100 * frac, 2),
                    "pos_jaccard": round(100 * jacc, 2),
                    "exact_pairs": f"{exact}/{total}",
                }
                if iterative and imp.get("stops"):
                    # side-by-side convergence + stop-iteration histograms
                    # (the reference prints exactly this histogram,
                    # eval/eval_imp.py:213-227)
                    def _hist(stops):
                        u, c = np.unique(stops, return_counts=True)
                        return {int(k): int(v) for k, v in zip(u, c)}
                    row["ref_conv"] = round(float(np.mean(ref["converged"])), 3)
                    row["impx_conv"] = round(float(np.mean(imp["converged"])), 3)
                    row["ref_stop_hist"] = _hist(ref["stops"])
                    row["impx_stop_hist"] = _hist(imp["stops"])
                    same_stop = np.mean(np.asarray(ref["stops"]) ==
                                        np.asarray(imp["stops"]))
                    row["same_stop_frac"] = round(float(same_stop), 3)
                rows.append(row)
                print(rows[-1], flush=True)

    print("\n=== cross-framework study (reference torch CPU vs impx) ===")
    print(f"{'config':<28} {'ref AUC@5/10/20':>20} {'impx AUC@5/10/20':>20} "
          f"{'refP':>6} {'impxP':>6} {'match%':>7} {'jacc%':>7} {'exact':>7}")
    for r in rows:
        name = (f"{r['method']}{'_iter' if r['iterative'] else ''}"
                f"{'_unc' if r.get('uncertainty') else ''}/{r['impx_pose']}")
        ra = "/".join(f"{v:.1f}" for v in r["ref_auc"])
        ia = "/".join(f"{v:.1f}" for v in r["impx_auc"])
        print(f"{name:<28} {ra:>20} {ia:>20} {r['ref_prec']:>6.1f} "
              f"{r['impx_prec']:>6.1f} {r['match_agree']:>7.2f} "
              f"{r['pos_jaccard']:>7.2f} {r['exact_pairs']:>7}")
    return rows


if __name__ == "__main__":
    main()
