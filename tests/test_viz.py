"""Visualization + match-evaluation utilities (reference tools/utils.py:463-878)."""
import numpy as np
import pytest

from impx.tools import viz


def test_eval_matches_reference_semantics():
    # pair (0,1): gt says 0->1 ok; (1,0): gt says 1->2, wrong; (2,2): ok;
    # (3,0): gt unmatched -> not correct
    pred = np.array([[0, 1], [1, 0], [2, 2], [3, 0]])
    gt = np.array([1, 2, 2, -1])
    out = viz.eval_matches(pred, gt)
    assert out["inlier_ratio"] == pytest.approx(2 / 4)
    assert out["recall_ratio"] == pytest.approx(2 / 3)
    # empty prediction
    out = viz.eval_matches(np.zeros((0, 2), int), gt)
    assert out["inlier_ratio"] == 0 and out["recall_ratio"] == 0


def test_error_colormap_endpoints():
    c = viz.error_colormap(np.array([0.0, 0.5, 1.0]))
    np.testing.assert_allclose(c[0], [1, 0, 0, 1])      # x=0 -> green=0? R=2,G=0 clipped
    np.testing.assert_allclose(c[0, 0], 1.0)            # clipped red channel
    np.testing.assert_allclose(c[2], [0, 1, 0, 1])
    np.testing.assert_allclose(c[1], [1, 1, 0, 1])


def test_make_matching_plot_roundtrip(tmp_path):
    matplotlib = pytest.importorskip("matplotlib")
    matplotlib.use("Agg")
    rs = np.random.RandomState(0)
    img0 = (rs.rand(120, 160) * 255).astype(np.uint8)
    img1 = (rs.rand(120, 160) * 255).astype(np.uint8)
    kpts = rs.rand(20, 2) * [160, 120]
    mk0, mk1 = kpts[:10], kpts[10:]
    color = viz.error_colormap(rs.rand(10))
    out = tmp_path / "match.png"
    viz.make_matching_plot(img0, img1, kpts, kpts, mk0, mk1, color,
                           text=["test"], path=str(out), show_keypoints=True)
    assert out.exists() and out.stat().st_size > 0
    # fast path (cv2 canvas; reference layout has a 10px margin)
    canvas = viz.make_matching_plot(img0, img1, kpts, kpts, mk0, mk1, color,
                                    fast_viz=True)
    assert canvas.shape == (120, 330, 3)


def test_make_matching_plot_fast(tmp_path):
    pytest.importorskip("cv2")
    rs = np.random.RandomState(2)
    img0 = (rs.rand(120, 160) * 255).astype(np.uint8)
    img1 = (rs.rand(100, 140) * 255).astype(np.uint8)
    kpts0 = rs.rand(20, 2) * [160, 120]
    kpts1 = rs.rand(20, 2) * [140, 100]
    mk0, mk1 = kpts0[:8], kpts1[:8]
    color = viz.error_colormap(rs.rand(8))
    out = tmp_path / "fast.png"
    canvas = viz.make_matching_plot_fast(
        img0, img1, kpts0, kpts1, mk0, mk1, color,
        text=["IMP", "matches: 8"], path=str(out), show_keypoints=True,
        small_text=["th: 0.2"])
    # max height, widths + margin; match lines drawn in color
    assert canvas.shape == (120, 160 + 140 + 10, 3)
    assert out.exists() and out.stat().st_size > 0
    assert not (canvas == canvas[0, 0]).all()  # something was drawn


def test_plot_matches_gt(tmp_path):
    """GT-comparison canvas (reference tools/utils.py plot_matches_cv2 role):
    stats must follow the GT assignment; GT panel doubles the height."""
    pytest.importorskip("cv2")
    rs = np.random.RandomState(3)
    img0 = (rs.rand(60, 80) * 255).astype(np.uint8)
    img1 = (rs.rand(60, 80) * 255).astype(np.uint8)
    kpts0 = rs.rand(6, 2) * [80, 60]
    kpts1 = rs.rand(6, 2) * [80, 60]
    # pred: 0->1 (gt-correct), 1->0 (wrong: gt says 1->2), 2 unmatched
    pred = np.array([1, 0, -1, -1, -1, -1])
    gt = np.array([1, 2, -1, -1, -1, -1])
    out = viz.plot_matches_gt(img0, img1, kpts0, kpts1, pred, gt_matches=gt,
                              save_fn=tmp_path / "gt.png")
    assert out["n_corr_match"] == 1 and out["n_gt_match"] == 2
    assert out["inlier_ratio"] == pytest.approx(1 / 2)
    assert out["recall_ratio"] == pytest.approx(1 / 2)
    assert out["match_img"].shape == (120, 160, 3)  # GT panel stacked below
    assert (tmp_path / "gt.png").exists()
    # inlier-mask coloring path (no GT)
    out2 = viz.plot_matches_gt(img0, img1, kpts0, kpts1, pred,
                               inliers=np.array([1, 0, 0, 0, 0, 0], bool))
    assert out2["n_corr_match"] == 1 and out2["match_img"].shape == (60, 160, 3)


def test_draw_matches_and_indices0():
    rs = np.random.RandomState(1)
    img = (rs.rand(60, 80) * 255).astype(np.uint8)
    idx0 = np.array([-1, 2, 0, -1])
    pairs = viz.matches_from_indices0(idx0)
    np.testing.assert_array_equal(pairs, [[1, 2], [2, 0]])
    kpts = rs.rand(5, 2) * [80, 60]
    canvas = viz.draw_matches(img, img, kpts, kpts, pairs,
                              inliers=np.array([True, False]))
    assert canvas.shape == (60, 160, 3)
