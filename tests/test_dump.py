"""Dump pipelines: reprojection GT-matching parity vs the reference torch
implementation, and a full ScanNet-dumper -> StandardReader round-trip on a
synthetic raw dataset."""
import os
import os.path as osp

import numpy as np
import pytest

import jax.numpy as jnp


def _random_pose(rs):
    from tests.test_geometry import bounded_rotation

    T = np.eye(4)
    T[:3, :3] = bounded_rotation(rs)
    T[:3, 3] = rs.randn(3) * 0.1
    return T


def test_reproject_points_parity(reference_path):
    from tools.geometry import reproject_points as ref_reproject

    from impx.geometry.reprojection import reproject_points

    rs = np.random.RandomState(0)
    n = 50
    pos1 = rs.rand(n, 2) * 400
    depth1 = rs.uniform(2, 10, n)
    K = np.array([[400.0, 0, 200], [0, 400, 150], [0, 0, 1]])
    pose1, pose2 = _random_pose(rs), _random_pose(rs)

    ref = ref_reproject(pos1.T, depth1, K, pose1, None, K, pose2, None).T
    ours = np.asarray(reproject_points(
        jnp.asarray(pos1), jnp.asarray(depth1), jnp.asarray(K), jnp.asarray(pose1),
        jnp.asarray(K), jnp.asarray(pose2)))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-3)


def test_match_from_projection_parity(reference_path):
    import torch
    from tools.geometry import match_from_projection_points_torch as ref_match

    from impx.geometry.reprojection import match_from_projection_points

    rs = np.random.RandomState(1)
    n, m = 80, 90
    K = np.array([[400.0, 0, 200], [0, 400, 150], [0, 0, 1]])
    pose1, pose2 = _random_pose(rs), _random_pose(rs)
    pos1 = rs.rand(n, 2) * 400
    depth1 = rs.uniform(2, 10, n)
    pos2 = rs.rand(m, 2) * 400
    depth2 = rs.uniform(2, 10, m)
    # make some true correspondences: project subset of points 1 into image 2
    from impx.geometry.reprojection import reproject_points

    proj = np.asarray(reproject_points(
        jnp.asarray(pos1[:30]), jnp.asarray(depth1[:30]), jnp.asarray(K),
        jnp.asarray(pose1), jnp.asarray(K), jnp.asarray(pose2)))
    pos2[:30] = proj + rs.randn(30, 2) * 0.5
    # consistent depth for the cycle check: depth of the 3D point in cam2
    X = np.concatenate([
        (pos1[:30, 0:1] + 0.5 - K[0, 2]) * depth1[:30, None] / K[0, 0],
        (pos1[:30, 1:2] + 0.5 - K[1, 2]) * depth1[:30, None] / K[1, 1],
        depth1[:30, None], np.ones((30, 1))], axis=1)
    X2 = (pose2 @ np.linalg.inv(pose1) @ X.T).T
    depth2[:30] = X2[:, 2]

    inl_ref, _ = ref_match(
        pos1=torch.from_numpy(pos1.T).float(), depth1=torch.from_numpy(depth1).float(),
        intrinsics1=torch.from_numpy(K).float(), pose1=torch.from_numpy(pose1).float(),
        bbox1=None,
        pos2=torch.from_numpy(pos2.T).float(), depth2=torch.from_numpy(depth2).float(),
        intrinsics2=torch.from_numpy(K).float(), pose2=torch.from_numpy(pose2).float(),
        bbox2=None, inlier_th=3, outlier_th=5, cycle_check=True)
    ref_pairs = {(int(a), int(b)) for a, b in inl_ref.numpy()}

    m12, _ = match_from_projection_points(
        jnp.asarray(pos1), jnp.asarray(depth1), jnp.asarray(K), jnp.asarray(pose1),
        jnp.asarray(pos2), jnp.asarray(depth2), jnp.asarray(K), jnp.asarray(pose2),
        inlier_th=3, outlier_th=5, cycle_check=True)
    m12 = np.asarray(m12)
    our_pairs = {(i, int(m12[i])) for i in range(n) if m12[i] >= 0}
    assert our_pairs == ref_pairs
    assert len(our_pairs) >= 25  # the planted correspondences are found


def test_scannet_dump_roundtrip(tmp_path):
    cv2 = pytest.importorskip("cv2")

    from impx.data.dump import get_dumper
    from impx.data.reader import StandardReader

    rs = np.random.RandomState(2)
    raw = tmp_path / "raw"
    seq = "scene0000_00"
    for sub in ["img", "extrinsic", "intrinsic"]:
        os.makedirs(raw / seq / sub, exist_ok=True)
    K = np.array([[100.0, 0, 64], [0, 100, 48], [0, 0, 1]])
    pairs = []
    for i in range(3):
        img = (rs.rand(96, 128) * 255).astype(np.uint8)
        img = cv2.GaussianBlur(img, (5, 5), 1.0)  # SIFT needs some structure
        cv2.imwrite(str(raw / seq / "img" / f"{i}.jpg"), img)
        np.savetxt(raw / seq / "extrinsic" / f"{i}.txt", _random_pose(rs))
        np.savetxt(raw / seq / "intrinsic" / f"{i}.txt", K)
    pairs = [f"{seq}/img/0.jpg {seq}/img/1.jpg", f"{seq}/img/1.jpg {seq}/img/2.jpg"]
    pair_fn = tmp_path / "pairs.txt"
    pair_fn.write_text("\n".join(pairs))

    config = {
        "data_name": "scannet",
        "rawdata_dir": str(raw),
        "feature_dump_dir": str(tmp_path / "feat"),
        "dataset_dump_dir": str(tmp_path / "ds"),
        "pair_list": str(pair_fn),
        "image_size": (96, 128),
        "extractor": {"name": "root", "num_kpt": 100, "det_th": 0.0,
                      "resize": [-1], "num_process": 1, "overwrite": True},
    }
    dumper = get_dumper("scannet", config)
    dumper.initialize()
    dumper.dump_feature()
    dumper.format_dump_data()

    reader = StandardReader({
        "rawdata_dir": str(raw),
        "dataset_dir": str(tmp_path / "ds" / "scannet_root_100.hdf5"),
        "num_kpt": 100,
    })
    assert len(reader) == 2
    info = reader.run(0)
    assert info["x1"].shape[1] == 3 and info["desc1"].shape[1] == 128
    assert info["K1"].shape == (3, 3)
    # E consistent with R, t
    from impx import geometry as G

    E_built = np.asarray(G.essential_from_pose(jnp.asarray(info["R"]), jnp.asarray(info["t"])))
    E_built = E_built / np.linalg.norm(E_built)
    diff = min(np.abs(E_built - info["e"]).max(), np.abs(E_built + info["e"]).max())
    assert diff < 1e-6
    assert info["img_size1"] == (96, 128)
