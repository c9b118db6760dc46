"""Keypoint coordinate normalizations (pure jnp, host-or-device).

Mirrors reference nets/layers.py:49-56 (`normalize_keypoints`),
dataset/utils.py:11-20 (`normalize_size`, `normalize_size_spg`) and
components/utils/evaluation_utils.py:6-8 (`normalize_intrinsic`).
"""
from __future__ import annotations

import jax.numpy as jnp


def normalize_keypoints(kpts, height, width, scale: float = 0.7):
    """Center + 0.7*max-dim scaling. kpts [..., N, 2] in (x, y) pixels."""
    size = jnp.asarray([width, height], dtype=kpts.dtype)
    center = size / 2.0
    scaling = jnp.max(size) * scale
    return (kpts - center) / scaling


def normalize_size(x, size, scale: float = 1.0):
    """(x - size/2 - 0.5) / (max(size)*scale); size = (w, h)."""
    size = jnp.asarray(size, dtype=x.dtype).reshape(1, 2)
    return (x - size / 2.0 - 0.5) / (jnp.max(size) * scale)


def normalize_size_spg(x, size):
    return normalize_size(x, size, scale=0.7)


def normalize_intrinsic(x, K):
    """Pixel -> normalized camera coordinates: (x - c) / f."""
    K = jnp.asarray(K, dtype=x.dtype)
    c = jnp.stack([K[0, 2], K[1, 2]])
    f = jnp.stack([K[0, 0], K[1, 1]])
    return (x - c) / f
