"""Geometry core: parity with the reference numpy/OpenCV implementations and
synthetic ground-truth sanity checks."""
import numpy as np
import pytest

import jax.numpy as jnp

from impx import geometry as G

RS = np.random.RandomState(0)


def random_rotation(rs):
    A = rs.randn(3, 3)
    Q, _ = np.linalg.qr(A)
    if np.linalg.det(Q) < 0:
        Q[:, 0] = -Q[:, 0]
    return Q


def bounded_rotation(rs, max_angle_deg=25.0):
    axis = rs.randn(3)
    axis /= np.linalg.norm(axis)
    angle = np.deg2rad(rs.uniform(2.0, max_angle_deg))
    K = np.array([[0, -axis[2], axis[1]], [axis[2], 0, -axis[0]], [-axis[1], axis[0], 0]])
    return np.eye(3) + np.sin(angle) * K + (1 - np.cos(angle)) * (K @ K)


def synthetic_pair(rs, n=200, noise=0.0):
    """Moderate relative pose + 3D points -> normalized image correspondences
    (bounded rotation so points stay in front of both cameras)."""
    R = bounded_rotation(rs)
    t = rs.randn(3)
    t /= np.linalg.norm(t)
    X = rs.randn(n, 3) * 2.0 + np.array([0, 0, 6.0])
    x0 = X[:, :2] / X[:, 2:3]
    X1 = X @ R.T + t
    x1 = X1[:, :2] / X1[:, 2:3]
    if noise > 0:
        x0 = x0 + rs.randn(*x0.shape) * noise
        x1 = x1 + rs.randn(*x1.shape) * noise
    return R, t, x0.astype(np.float64), x1.astype(np.float64)


def test_essential_from_pose_epipolar_zero():
    R, t, x0, x1 = synthetic_pair(RS)
    E = np.asarray(G.essential_from_pose(jnp.asarray(R), jnp.asarray(t)))
    d = np.asarray(G.epipolar_distance(jnp.asarray(x0), jnp.asarray(x1), jnp.asarray(E)))
    assert d.max() < 1e-6
    s = np.asarray(G.sampson_distance(jnp.asarray(x0), jnp.asarray(x1), jnp.asarray(E)))
    assert s.max() < 1e-10


def test_compute_epi_inlier_parity(reference_path):
    from components.utils.metrics import compute_epi_inlier as ref_inlier

    R, t, x0, x1 = synthetic_pair(RS, noise=2e-3)
    E = np.asarray(G.essential_from_pose(jnp.asarray(R), jnp.asarray(t)))
    ref = ref_inlier(x0, x1, E, 0.005)
    ours = np.asarray(G.compute_epi_inlier(jnp.asarray(x0), jnp.asarray(x1), jnp.asarray(E), 0.005))
    np.testing.assert_array_equal(ours, ref)


def test_evaluate_R_t_parity(reference_path):
    from components.utils.metrics import evaluate_R_t as ref_eval

    rs = np.random.RandomState(1)
    for _ in range(5):
        R1, R2 = random_rotation(rs), random_rotation(rs)
        t1, t2 = rs.randn(3), rs.randn(3)
        ref_q, ref_t = ref_eval(R1, t1, R2, t2)
        our_q, our_t = G.evaluate_R_t(jnp.asarray(R1), jnp.asarray(t1),
                                      jnp.asarray(R2), jnp.asarray(t2))
        np.testing.assert_allclose(float(our_q), ref_q, rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(float(our_t), ref_t, rtol=1e-4, atol=1e-4)


def test_pose_auc_parity(reference_path):
    from components.utils.metrics import pose_auc as ref_auc, approx_pose_auc as ref_approx

    rs = np.random.RandomState(2)
    errors = rs.rand(500) * 40
    ths = np.arange(7) * 5
    np.testing.assert_allclose(G.pose_auc(errors, ths[1:]), ref_auc(errors, ths), rtol=1e-9)
    np.testing.assert_allclose(G.approx_pose_auc(errors, ths), ref_approx(errors, ths), rtol=1e-9)


def test_compute_pose_error_parity(reference_path):
    from tools.utils import compute_pose_error as ref_cpe

    rs = np.random.RandomState(3)
    R, t, _, _ = synthetic_pair(rs)
    T = np.hstack([R, t.reshape(3, 1)])
    R2 = random_rotation(rs)
    t2 = rs.randn(3)
    ref_t, ref_R = ref_cpe(T, R2, t2)
    our_t, our_R = G.compute_pose_error(jnp.asarray(T), jnp.asarray(R2), jnp.asarray(t2))
    np.testing.assert_allclose(float(our_t), ref_t, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(float(our_R), ref_R, rtol=1e-5, atol=1e-5)


def test_triangulate_parity_cv2():
    cv2 = pytest.importorskip("cv2")
    R, t, x0, x1 = synthetic_pair(RS, n=50)
    P0 = np.eye(3, 4)
    P1 = np.hstack([R, t.reshape(3, 1)])
    ref = cv2.triangulatePoints(P0, P1, x0.T.astype(np.float64), x1.T.astype(np.float64)).T
    ours = np.asarray(G.triangulate_points(jnp.asarray(P0), jnp.asarray(P1),
                                           jnp.asarray(x0), jnp.asarray(x1)))
    # homogeneous: compare normalized 3D points
    ref3 = ref[:, :3] / ref[:, 3:4]
    ours3 = ours[:, :3] / ours[:, 3:4]
    np.testing.assert_allclose(ours3, ref3, rtol=1e-4, atol=1e-4)


def test_decompose_essential_recovers_pose():
    rs = np.random.RandomState(4)
    for _ in range(5):
        R, t, x0, x1 = synthetic_pair(rs)
        E = np.asarray(G.essential_from_pose(jnp.asarray(R), jnp.asarray(t)))
        R_hat, t_hat, mask, n_good = G.decompose_essential_mat(
            jnp.asarray(E), jnp.asarray(x0), jnp.asarray(x1))
        err_R = float(G.angle_error_mat(jnp.asarray(R), R_hat))
        err_t = float(G.angle_error_vec(jnp.asarray(t), t_hat))
        assert err_R < 0.1, err_R  # fp32 triangulation/SVD precision
        assert err_t < 0.1, err_t
        assert int(n_good) > 0.9 * len(x0)
