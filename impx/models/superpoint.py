"""SuperPoint detector + descriptor — XLA convs, on-device NMS and top-k.

Mirrors reference nets/superpoint.py: VGG-style shared encoder (8 convs, 3
maxpools), 65-channel score head reshaped 8x8-cell -> pixel, iterated-maxpool
NMS (superpoint.py:49-64), border removal, top-k keypoints, bilinear
descriptor sampling at keypoint locations (superpoint.py:82-94).

TPU-first deltas:
  * NHWC layout, HWIO kernels (MXU-friendly; the converter transposes
    superpoint_v1.pth accordingly);
  * fixed-shape output: always `max_keypoints` slots + a validity mask
    (score > keypoint_threshold), instead of ragged per-image lists — feeds
    straight into the padded matcher;
  * NMS via reduce_window max (the same math as torch max_pool2d).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

DEFAULT_CONFIG = {
    "descriptor_dim": 256,
    "nms_radius": 4,
    "keypoint_threshold": 0.0025,
    "max_keypoints": 1024,
    "remove_borders": 4,
}


def _conv(p, x, stride: int = 1):
    # inputs may be bf16 (see backbone compute_dtype); accumulate in fp32 on
    # the MXU either way, then return to the input dtype
    y = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), window_strides=(stride, stride),
        padding="SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    return (y + p["b"]).astype(x.dtype)


def _max_pool(x, k: int, stride: int):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, k, k, 1), (1, stride, stride, 1), "SAME")


def simple_nms(scores, nms_radius: int):
    """Iterated max-pool NMS (reference superpoint.py:49-64). scores [B,H,W]."""
    def max_pool(x):
        return _max_pool(x[..., None], nms_radius * 2 + 1, 1)[..., 0]

    zeros = jnp.zeros_like(scores)
    max_mask = scores == max_pool(scores)
    for _ in range(2):
        supp_mask = max_pool(max_mask.astype(scores.dtype)) > 0
        supp_scores = jnp.where(supp_mask, zeros, scores)
        new_max_mask = supp_scores == max_pool(supp_scores)
        max_mask = max_mask | (new_max_mask & (~supp_mask))
    return jnp.where(max_mask, scores, zeros)


def backbone(params, image, compute_dtype=jnp.float32):
    """image [B,H,W,1] in [0,1] -> (dense scores [B,H,W], descriptors [B,H/8,W/8,D]).

    compute_dtype=bfloat16 runs the VGG stack on the MXU at double rate with
    fp32 accumulation inside every conv (preferred_element_type); the score
    softmax and descriptor L2 norm are always computed in fp32."""
    x = image.astype(compute_dtype)
    for name in ["conv1a", "conv1b"]:
        x = jax.nn.relu(_conv(params[name], x))
    x = _max_pool(x, 2, 2)
    for name in ["conv2a", "conv2b"]:
        x = jax.nn.relu(_conv(params[name], x))
    x = _max_pool(x, 2, 2)
    for name in ["conv3a", "conv3b"]:
        x = jax.nn.relu(_conv(params[name], x))
    x = _max_pool(x, 2, 2)
    for name in ["conv4a", "conv4b"]:
        x = jax.nn.relu(_conv(params[name], x))

    cPa = jax.nn.relu(_conv(params["convPa"], x))
    scores = _conv(params["convPb"], cPa).astype(jnp.float32)  # [B, h, w, 65]
    scores = jax.nn.softmax(scores, axis=-1)[..., :-1]
    b, h, w, _ = scores.shape
    scores = scores.reshape(b, h, w, 8, 8)
    scores = scores.transpose(0, 1, 3, 2, 4).reshape(b, h * 8, w * 8)

    cDa = jax.nn.relu(_conv(params["convDa"], x))
    desc = _conv(params["convDb"], cDa).astype(jnp.float32)
    desc = desc / (jnp.linalg.norm(desc, axis=-1, keepdims=True) + 1e-15)
    return scores, desc


def sample_descriptors(keypoints, descriptors, s: int = 8):
    """Bilinear descriptor sampling at pixel keypoints (reference
    superpoint.py:82-94). NOTE the reference's torch-version check
    (`int(torch.__version__[2]) > 2`, superpoint.py:89) evaluates False on
    torch >= 1.3, so grid_sample runs with align_corners=False — replicated
    here: pixel = ((g + 1) * size - 1) / 2.

    keypoints [N,2] (x,y) pixels; descriptors [hc,wc,D]. Returns [N,D] L2-normed.
    """
    hc, wc, d = descriptors.shape
    # map pixel coords to descriptor-grid coords in [-1, 1] then to grid idx
    kp = keypoints - s / 2 + 0.5
    kp = kp / jnp.asarray([(wc * s - s / 2 - 0.5), (hc * s - s / 2 - 0.5)], keypoints.dtype)
    kp = kp * 2 - 1
    gx = ((kp[:, 0] + 1.0) * wc - 1.0) / 2.0
    gy = ((kp[:, 1] + 1.0) * hc - 1.0) / 2.0

    x0 = jnp.clip(jnp.floor(gx).astype(jnp.int32), 0, wc - 1)
    y0 = jnp.clip(jnp.floor(gy).astype(jnp.int32), 0, hc - 1)
    x1 = jnp.clip(x0 + 1, 0, wc - 1)
    y1 = jnp.clip(y0 + 1, 0, hc - 1)
    wx = jnp.clip(gx - x0, 0.0, 1.0)[:, None]
    wy = jnp.clip(gy - y0, 0.0, 1.0)[:, None]

    d00 = descriptors[y0, x0]
    d01 = descriptors[y0, x1]
    d10 = descriptors[y1, x0]
    d11 = descriptors[y1, x1]
    out = (d00 * (1 - wx) * (1 - wy) + d01 * wx * (1 - wy)
           + d10 * (1 - wx) * wy + d11 * wx * wy)
    return out / (jnp.linalg.norm(out, axis=-1, keepdims=True) + 1e-15)


@partial(jax.jit, static_argnames=("nms_radius", "max_keypoints", "border",
                                   "keypoint_threshold", "compute_dtype"))
def extract_keypoints(
    params,
    image,
    nms_radius: int = 4,
    max_keypoints: int = 1024,
    border: int = 4,
    keypoint_threshold: float = 0.0025,
    compute_dtype=jnp.float32,
):
    """image [B,H,W,1] -> dict(keypoints [B,K,2] (x,y), scores [B,K],
    descriptors [B,K,D], valid [B,K]). Fixed K = max_keypoints."""
    scores, dense_desc = backbone(params, image, compute_dtype=compute_dtype)
    scores = simple_nms(scores, nms_radius)
    b, h, w = scores.shape

    ys = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    border_ok = ((ys >= border) & (ys < h - border)
                 & (xs >= border) & (xs < w - border))
    scores = jnp.where(border_ok[None], scores, 0.0)

    flat = scores.reshape(b, h * w)
    top_scores, top_idx = jax.lax.top_k(flat, max_keypoints)
    ky = (top_idx // w).astype(jnp.float32)
    kx = (top_idx % w).astype(jnp.float32)
    keypoints = jnp.stack([kx, ky], axis=-1)  # (x, y) like reference flip
    valid = top_scores > keypoint_threshold

    descs = jax.vmap(lambda kp, dd: sample_descriptors(kp, dd))(keypoints, dense_desc)
    return {
        "keypoints": keypoints,
        "scores": jnp.where(valid, top_scores, 0.0),
        "descriptors": descs,
        "valid": valid,
    }


def init_params(key, desc_dim: int = 256):
    """Random-weight SuperPoint parameter pytree (standard channel plan,
    reference superpoint.py:121-136) — for tests/benchmarks; real weights
    come from impx.tools.convert_torch.load_superpoint_checkpoint."""
    import jax

    plan = {
        "conv1a": (3, 1, 64), "conv1b": (3, 64, 64),
        "conv2a": (3, 64, 64), "conv2b": (3, 64, 64),
        "conv3a": (3, 64, 128), "conv3b": (3, 128, 128),
        "conv4a": (3, 128, 128), "conv4b": (3, 128, 128),
        "convPa": (3, 128, 256), "convPb": (1, 256, 65),
        "convDa": (3, 128, 256), "convDb": (1, 256, desc_dim),
    }
    params = {}
    keys = jax.random.split(key, len(plan))
    for k_, (name, (ks, cin, cout)) in zip(keys, plan.items()):
        scale = (2.0 / (ks * ks * cin)) ** 0.5
        params[name] = {
            "w": jax.random.normal(k_, (ks, ks, cin, cout)) * scale,
            "b": jnp.zeros((cout,)),
        }
    return params
