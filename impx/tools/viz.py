"""Match visualization (reference tools/utils.py:463-847 and
components/utils/evaluation_utils.py draw_match): side-by-side keypoint and
match rendering via OpenCV, host-side."""
from __future__ import annotations

import numpy as np


def draw_points(img, points, color=(0, 255, 0), radius: int = 3):
    import cv2

    img = img.copy()
    for p in np.asarray(points):
        cv2.circle(img, (int(p[0]), int(p[1])), radius=radius, color=color)
    return img


def draw_matches(img0, img1, kpts0, kpts1, matches, inliers=None,
                 color_in=(0, 255, 0), color_out=(0, 0, 255)):
    """matches: [M,2] index pairs; inliers: optional [M] bool mask."""
    import cv2

    img0 = np.atleast_3d(img0)
    img1 = np.atleast_3d(img1)
    if img0.shape[2] == 1:
        img0 = np.repeat(img0, 3, axis=2)
    if img1.shape[2] == 1:
        img1 = np.repeat(img1, 3, axis=2)
    h = max(img0.shape[0], img1.shape[0])
    w = img0.shape[1] + img1.shape[1]
    canvas = np.zeros((h, w, 3), np.uint8)
    canvas[: img0.shape[0], : img0.shape[1]] = img0
    canvas[: img1.shape[0], img0.shape[1]:] = img1
    off = img0.shape[1]
    matches = np.asarray(matches)
    if inliers is None:
        inliers = np.ones(len(matches), bool)
    for (i, j), ok in zip(matches, inliers):
        p0 = (int(kpts0[i][0]), int(kpts0[i][1]))
        p1 = (int(kpts1[j][0]) + off, int(kpts1[j][1]))
        cv2.line(canvas, p0, p1, color_in if ok else color_out, 1, cv2.LINE_AA)
    return canvas


def matches_from_indices0(indices0):
    """[N] matcher output (-1 unmatched) -> [M,2] index pairs."""
    indices0 = np.asarray(indices0)
    valid = indices0 > -1
    return np.stack([np.where(valid)[0], indices0[valid]], axis=1)
