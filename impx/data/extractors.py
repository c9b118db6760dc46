"""Feature extractors + the plugin registry.

Mirrors reference components/extractors.py (`ExtractSIFT` with RootSIFT
normalization, `ExtractSuperpoint`) and components/load_component.py: a string
-> component factory used by the dumpers and eval drivers.

SIFT is inherently ragged host work: OpenCV's C++ implementation when
available, else the bundled native C++ SIFT (native/sift, via ctypes) —
see impx/data/sift_native.py. SuperPoint runs on-device (impx/models/superpoint).
"""
from __future__ import annotations

import numpy as np


def resize_image(img, resize):
    """max-side or (h, w) resize; returns (img, scale[sx, sy]) — reference
    components/extractors.py:14-24."""
    import cv2

    img_h, img_w = img.shape[:2]
    cur_size = max(img_h, img_w)
    if len(resize) == 1:
        scale1 = scale2 = resize[0] / cur_size
    else:
        scale1, scale2 = resize[0] / img_h, resize[1] / img_w
    new_h, new_w = int(img_h * scale1), int(img_w * scale2)
    new_img = cv2.resize(img.astype("float32"), (new_w, new_h)).astype("uint8")
    return new_img, np.asarray([scale2, scale1])


class ExtractSIFT:
    """OpenCV SIFT + RootSIFT norm, response-sorted top-k
    (reference components/extractors.py:27-47)."""

    def __init__(self, config: dict, root: bool = True):
        self.num_kp = config["num_kpt"]
        self.contrastThreshold = config.get("det_th", 1e-5)
        self.resize = config.get("resize", [-1])
        self.root = root

    def run(self, img_or_path):
        import cv2

        if isinstance(img_or_path, str):
            img = cv2.imread(img_or_path, cv2.IMREAD_GRAYSCALE)
        else:
            img = img_or_path
        scale = [1, 1]
        if self.resize[0] != -1:
            img, scale = resize_image(img, self.resize)
        sift = cv2.SIFT_create(nfeatures=self.num_kp,
                               contrastThreshold=self.contrastThreshold)
        cv_kp, desc = sift.detectAndCompute(img, None)
        if not cv_kp:
            return np.zeros((0, 3), np.float32), np.zeros((0, 128), np.float32)
        kp = np.array([[k.pt[0] / scale[0], k.pt[1] / scale[1], k.response]
                       for k in cv_kp])
        index = np.flip(np.argsort(kp[:, 2]))
        kp, desc = kp[index], desc[index]
        if self.root:
            desc = np.sqrt(
                np.abs(desc / (np.linalg.norm(desc, axis=-1, ord=1)[:, None] + 1e-8)))
        return kp[: self.num_kp].astype(np.float32), desc[: self.num_kp]


class ExtractSuperpoint:
    """On-device SuperPoint behind the same interface
    (reference components/extractors.py:50-89; padding option included)."""

    def __init__(self, config: dict):
        self.num_kp = config["num_kpt"]
        self.det_th = config.get("det_th", 0.005)
        self.resize = config.get("resize", [-1])
        self.padding = config.get("padding", False)
        self.weight_path = config.get("weight_path", "weights/superpoint_v1.pth")
        # "bfloat16" runs the CNN at MXU double rate (fp32 accumulation);
        # extraction parity: tests/test_superpoint.py::test_bf16_extraction
        self.compute_dtype = config.get("compute_dtype", "float32")
        self._params = None

    @property
    def params(self):
        if self._params is None:
            import os.path as osp

            if osp.isfile(self.weight_path):
                from impx.tools.convert_torch import load_superpoint_checkpoint

                self._params = load_superpoint_checkpoint(self.weight_path)
            else:
                raise FileNotFoundError(
                    f"SuperPoint weights not found at {self.weight_path}")
        return self._params

    def run(self, img_or_path):
        import cv2
        import jax.numpy as jnp

        from impx.models.superpoint import extract_keypoints

        if isinstance(img_or_path, str):
            img = cv2.imread(img_or_path, cv2.IMREAD_GRAYSCALE)
        else:
            img = img_or_path
        scale = 1
        if self.resize[0] != -1:
            img, scale = resize_image(img, self.resize)
        # pad to conv-friendly multiple of 8
        h, w = img.shape
        ph, pw = (-h) % 8, (-w) % 8
        if ph or pw:
            img = np.pad(img, ((0, ph), (0, pw)))
        x = jnp.asarray(img / 255.0, jnp.float32)[None, :, :, None]
        out = extract_keypoints(self.params, x, max_keypoints=self.num_kp,
                                keypoint_threshold=self.det_th,
                                compute_dtype=jnp.dtype(self.compute_dtype))
        valid = np.asarray(out["valid"][0])
        kpt = np.asarray(out["keypoints"][0])[valid]
        score = np.asarray(out["scores"][0])[valid]
        desc = np.asarray(out["descriptors"][0])[valid]
        if isinstance(scale, np.ndarray):
            kpt = kpt / scale[None]
        kpt = np.concatenate([kpt, score[:, None]], axis=-1)

        if self.padding and len(kpt) < self.num_kp:
            res = self.num_kp - len(kpt)
            pad_x = np.random.uniform(size=[res, 2]) * (img.shape[0] + img.shape[1]) / 2
            pad_desc = np.random.uniform(size=[res, desc.shape[1] if len(desc) else 256])
            pad_desc = pad_desc / np.linalg.norm(pad_desc, axis=-1)[:, None]
            kpt = np.concatenate([kpt, np.concatenate([pad_x, np.zeros([res, 1])], -1)], 0)
            desc = np.concatenate([desc, pad_desc], 0) if len(desc) else pad_desc
        return kpt.astype(np.float32), desc.astype(np.float32)


def load_component(kind: str, name: str, config: dict):
    """Plugin registry (reference components/load_component.py)."""
    registry = {
        ("extractor", "root"): lambda c: ExtractSIFT(c, root=True),
        ("extractor", "sift"): lambda c: ExtractSIFT(c, root=False),
        ("extractor", "sp"): ExtractSuperpoint,
    }
    if kind == "reader":
        from impx.data.reader import StandardReader

        return StandardReader(config)
    if kind == "evaluator":
        from impx.eval.evaluator import AucEval, FMBenchEval

        return {"auc": AucEval, "fm": FMBenchEval}[name](config)
    if kind == "matcher":
        from impx.eval.eval_imp import build_model

        return build_model(name, config.get("feature", "spp"))
    try:
        return registry[(kind, name)](config)
    except KeyError:
        raise ValueError(f"unknown component {kind}/{name}") from None
