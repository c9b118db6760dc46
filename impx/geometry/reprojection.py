"""Depth-based reprojection and ground-truth match generation — pure jnp.

Mirrors reference tools/geometry.py: `reproject_points` (geometry.py:53-89,
COLMAP +0.5 pixel-center convention with optional crop bboxes) and
`match_from_projection_points` (geometry.py:239-280: nearest reprojection
within inlier_th = match, beyond outlier_th = non-match, optional cycle
check). Used by the MegaDepth dump pipeline to label correspondences; runs
batched on device (the reference does this per-pair on GPU torch,
dump_megadepth.py:299-312).
"""
from __future__ import annotations

import jax.numpy as jnp


def reproject_points(pos1, depth1, K1, pose1, K2, pose2, bbox1=None, bbox2=None):
    """pos1 [N,2] (x, y) pixels in image 1 with per-point depth [N] ->
    projected pixels [N,2] in image 2. pose* are world->cam 4x4."""
    if bbox1 is not None:
        u1 = pos1[:, 0] + bbox1[1] + 0.5
        v1 = pos1[:, 1] + bbox1[0] + 0.5
    else:
        u1 = pos1[:, 0] + 0.5
        v1 = pos1[:, 1] + 0.5
    Z1 = depth1
    X1 = (u1 - K1[0, 2]) * (Z1 / K1[0, 0])
    Y1 = (v1 - K1[1, 2]) * (Z1 / K1[1, 1])
    XYZ1 = jnp.stack([X1, Y1, Z1, jnp.ones_like(Z1)], axis=0)  # [4, N]

    P = pose2 @ jnp.linalg.inv(pose1)
    XYZ2h = P @ XYZ1
    XYZ2 = XYZ2h[:3] / (XYZ2h[3:4] + 1e-5)
    uv2h = K2 @ XYZ2
    uv2 = uv2h[:2] / (uv2h[2:3] + 1e-5)
    if bbox2 is not None:
        u2 = uv2[0] - bbox2[1] - 0.5
        v2 = uv2[1] - bbox2[0] - 0.5
    else:
        u2 = uv2[0] - 0.5
        v2 = uv2[1] - 0.5
    return jnp.stack([u2, v2], axis=1)  # [N, 2]


def match_from_projection_points(
    pos1, depth1, K1, pose1,
    pos2, depth2, K2, pose2,
    inlier_th: float = 3.0,
    outlier_th: float = 5.0,
    cycle_check: bool = True,
    valid1=None, valid2=None,
):
    """GT correspondence labelling by depth reprojection with cycle check.

    Returns (matches12 [N] int32: index into pos2 or -1; is_outlier [N] bool:
    reprojects >= outlier_th from every keypoint — certain non-matches).
    Fixed shapes: callers filter with the masks.
    """
    proj12 = reproject_points(pos1, depth1, K1, pose1, K2, pose2)  # [N,2]
    d = jnp.linalg.norm(proj12[:, None, :] - pos2[None, :, :], axis=-1)  # [N,M]
    if valid2 is not None:
        d = jnp.where(valid2[None, :], d, jnp.inf)
    matches12 = jnp.argmin(d, axis=1)
    errors12 = jnp.min(d, axis=1)

    inlier = errors12 <= inlier_th
    outlier = errors12 >= outlier_th
    if valid1 is not None:
        inlier = inlier & valid1
        outlier = outlier & valid1

    if cycle_check:
        md2 = depth2[matches12]
        mp2 = pos2[matches12]
        proj21 = reproject_points(mp2, md2, K2, pose2, K1, pose1)
        err21 = jnp.linalg.norm(proj21 - pos1, axis=-1)
        inlier = inlier & (err21 <= inlier_th)

    return jnp.where(inlier, matches12, -1).astype(jnp.int32), outlier
