"""Repro kit (impx.eval.reproduce): protocol constants + the full
download-layout -> dump -> eval chain on synthetic scenes."""
import os
import pickle

import numpy as np
import pytest


def test_protocol_constants():
    """The published protocol, pinned (reference README.md:92-154,
    dump/configs/{yfcc,scannet}_{sp,root}.yaml, eval configs): a drifted
    constant here means the reproduction no longer measures the paper."""
    from impx.eval.reproduce import (PROTOCOL, YFCC_SEQS, build_dump_config,
                                     build_eval_config)

    y = PROTOCOL[("yfcc", "spp")]
    assert (y["num_kpt"], y["resize"], y["rescale"]) == (2000, [1600], 1600)
    assert (y["inlier_th"], y["error_th_px"]) == (0.005, 1)
    s = PROTOCOL[("scannet", "spp")]
    assert (s["num_kpt"], s["resize"], s["rescale"]) == (1000, [480, 640], 640)
    assert (s["inlier_th"], s["error_th_px"]) == (0.005, 3)
    assert len(YFCC_SEQS) == 4

    dc = build_dump_config("yfcc", "spp", "/data/yfcc", "/dump")
    assert dc["extractor"]["num_kpt"] == 2000
    assert dc["extractor"]["resize"] == [1600]
    assert dc["data_seq"] == YFCC_SEQS and dc["data_split"] == ["test"]
    ec = build_eval_config("yfcc", "spp", "/data/yfcc", "/dump")
    assert ec["reader"]["num_kpt"] == 2000
    assert ec["reader"]["dataset_dir"].endswith("yfcc_sp_2000.hdf5")
    assert ec["evaluator"] == {"rescale": 1600, "inlier_th": 0.005}

    dc = build_dump_config("scannet", "spp", "/data/scannet", "/dump")
    assert dc["extractor"]["num_kpt"] == 1000
    assert dc["image_size"] == [480, 640]
    ec = build_eval_config("scannet", "spp", "/data/scannet", "/dump")
    assert ec["evaluator"] == {"rescale": 640, "inlier_th": 0.005}
    assert ec["reader"]["dataset_dir"].endswith("scannet_sp_1000.hdf5")


def test_download_chunk_protocol():
    """--download resolves to the reference's exact chunk URLs
    (download_data.sh raw_data raw_data_yfcc.tar.gz 0 8)."""
    from impx.data.dump.download_data import chunk_urls
    from impx.eval.reproduce import YFCC_ARCHIVE

    name, _, lo, hi = YFCC_ARCHIVE
    urls = chunk_urls(name, lo, hi)
    assert len(urls) == 9
    assert urls[0].endswith("oanet_data/raw_data.tar.000")
    assert urls[-1].endswith("oanet_data/raw_data.tar.008")


def _write_yfcc_raw(tmp_path, seqs, rs, n_imgs=3, hw=(96, 128)):
    """Miniature raw layout in the YFCC download's structure: per-scene
    test/images/*.jpg + images.txt/calibration.txt + per-image calibration
    HDF5 (K, imsize, R, T), plus pairs/<seq>-te-1000-pairs.pkl."""
    import cv2
    import h5py

    h, w = hw
    K = np.array([[120.0, 0, (w - 1) / 2], [0, 120.0, (h - 1) / 2],
                  [0, 0, 1.0]])
    os.makedirs(tmp_path / "pairs", exist_ok=True)
    for seq in seqs:
        sdir = tmp_path / "yfcc100m" / seq / "test"
        os.makedirs(sdir / "images", exist_ok=True)
        os.makedirs(sdir / "calibration", exist_ok=True)
        names, cals = [], []
        for i in range(n_imgs):
            img = (rs.rand(h, w) * 255).astype(np.uint8)
            img = cv2.GaussianBlur(img, (5, 5), 1.0)
            cv2.imwrite(str(sdir / "images" / f"{i}.jpg"), img)
            names.append(f"images/{i}.jpg")
            cal = f"calibration/cal{i}.h5"
            ang = rs.randn(3) * 0.1
            Rm, _ = cv2.Rodrigues(ang)
            with h5py.File(sdir / cal, "w") as f:
                f["K"] = K
                f["imsize"] = np.array([[w, h]])
                f["R"] = Rm
                f["T"] = rs.randn(3)
            cals.append(cal)
        np.savetxt(sdir / "images.txt", names, fmt="%s")
        np.savetxt(sdir / "calibration.txt", cals, fmt="%s")
        with open(tmp_path / "pairs" / f"{seq}-te-1000-pairs.pkl", "wb") as f:
            pickle.dump([(0, 1), (1, 2)], f)


def test_reproduce_chain_on_synthetic_scenes(tmp_path):
    """The full chain — raw layout -> protocol dump (RootSIFT @ the published
    2000-kpt budget) -> standard HDF5 -> eval_imp — runs end to end on 3
    synthetic scenes and returns the table's metric dict. Matcher depth is
    shrunk for CPU (--layers 2); every DATA-path constant is the protocol's."""
    cv2 = pytest.importorskip("cv2")
    from impx.eval.reproduce import (build_dump_config, build_eval_config,
                                     run_dump, run_eval)

    rs = np.random.RandomState(0)
    seqs = ["scene_a", "scene_b", "scene_c"]
    _write_yfcc_raw(tmp_path, seqs, rs)

    dump_cfg = build_dump_config("yfcc", "sift", str(tmp_path),
                                 str(tmp_path / "dump"), seqs=seqs)
    dump_cfg["extractor"]["num_process"] = 1
    run_dump(dump_cfg)
    assert os.path.isfile(tmp_path / "dump" / "yfcc_root_2000.hdf5")

    eval_cfg = build_eval_config("yfcc", "sift", str(tmp_path),
                                 str(tmp_path / "dump"))
    results = run_eval("yfcc", "sift", eval_cfg, "IMP",
                       extra_args=("--layers", "2", "--max_pairs", "3",
                                   "--eval_batch", "1"))
    # random weights: metrics near zero, but the protocol chain produced the
    # table's metric structure from raw images
    assert set(results) >= {"auc", "precision", "matching_score"}
    assert set(results["auc"]) == {5, 10, 20, 50}
