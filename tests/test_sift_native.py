"""Native C++ SIFT: detection on synthetic structure + descriptor matching
across a known shift (functional validation; OpenCV agreement where present)."""
import numpy as np
import pytest


def _textured_image(rs, h=240, w=320):
    """Random blobs on a gradient -> plenty of DoG extrema."""
    img = np.zeros((h, w), np.float32)
    for _ in range(60):
        cy, cx = rs.randint(30, h - 30), rs.randint(30, w - 30)
        r = rs.randint(3, 9)
        amp = rs.uniform(60, 200) * rs.choice([-1, 1])
        yy, xx = np.mgrid[-3 * r:3 * r + 1, -3 * r:3 * r + 1]
        patch = amp * np.exp(-(yy ** 2 + xx ** 2) / (2.0 * (r / 1.5) ** 2))
        y0, x0 = cy - 3 * r, cx - 3 * r
        img[y0:y0 + patch.shape[0], x0:x0 + patch.shape[1]] += patch
    img += 120
    return np.clip(img, 0, 255).astype(np.uint8)


@pytest.fixture(scope="module")
def native_sift():
    from impx.data import sift_native

    try:
        sift_native._load()
    except Exception as e:  # g++ missing etc
        pytest.skip(f"native sift unavailable: {e}")
    return sift_native


def test_detects_blobs(native_sift):
    rs = np.random.RandomState(0)
    img = _textured_image(rs)
    kpts, desc = native_sift.extract(img, max_kpts=500)
    assert len(kpts) > 50, len(kpts)
    assert desc.shape[1] == 128
    # descriptors are nonzero and bounded
    norms = np.linalg.norm(desc, axis=1)
    assert (norms > 1).all()
    # keypoints inside the image
    assert (kpts[:, 0] >= 0).all() and (kpts[:, 0] < img.shape[1]).all()
    assert (kpts[:, 1] >= 0).all() and (kpts[:, 1] < img.shape[0]).all()


def test_descriptor_matching_across_shift(native_sift):
    """Features of a translated image must match their counterparts by NN
    descriptor search at the correct displacement."""
    rs = np.random.RandomState(1)
    img = _textured_image(rs)
    dy, dx = 7, 13
    img2 = np.roll(np.roll(img, dy, axis=0), dx, axis=1)

    k1, d1 = native_sift.extract(img, max_kpts=300)
    k2, d2 = native_sift.extract(img2, max_kpts=300)
    assert len(k1) > 30 and len(k2) > 30

    sim = d1 @ d2.T
    nn = sim.argmax(1)
    disp = k2[nn, :2] - k1[:, :2]
    err = np.linalg.norm(disp - np.array([dx, dy]), axis=1)
    good = (err < 2.0).mean()
    assert good > 0.5, f"only {good:.2f} of NN matches at the true shift"


def test_against_opencv_keypoints(native_sift):
    cv2 = pytest.importorskip("cv2")
    rs = np.random.RandomState(2)
    img = _textured_image(rs)
    k_nat, _ = native_sift.extract(img, max_kpts=300)
    cv_kp = cv2.SIFT_create(nfeatures=300).detect(img, None)
    cv_pts = np.array([kp.pt for kp in cv_kp])
    assert len(cv_pts) > 30
    # most native keypoints have an OpenCV keypoint within 3px
    d = np.linalg.norm(k_nat[:, None, :2] - cv_pts[None], axis=2).min(1)
    assert (d < 3.0).mean() > 0.6, (d < 3.0).mean()
