import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from dynamic_vins_tpu.geometry import lie


def random_quats(rng, n):
    q = rng.normal(size=(n, 4))
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def test_quat_multiply_matches_matrix_product(rng):
    q1, q2 = random_quats(rng, 16), random_quats(rng, 16)
    q12 = lie.quat_multiply(jnp.asarray(q1), jnp.asarray(q2))
    R12 = lie.quat_to_matrix(q12)
    R_expected = np.asarray(lie.quat_to_matrix(jnp.asarray(q1))) @ np.asarray(
        lie.quat_to_matrix(jnp.asarray(q2)))
    np.testing.assert_allclose(np.asarray(R12), R_expected, atol=1e-12)


def test_quat_rotate_matches_matrix(rng):
    q = random_quats(rng, 16)
    v = rng.normal(size=(16, 3))
    out = lie.quat_rotate(jnp.asarray(q), jnp.asarray(v))
    R = np.asarray(lie.quat_to_matrix(jnp.asarray(q)))
    np.testing.assert_allclose(np.asarray(out),
                               np.einsum("nij,nj->ni", R, v), atol=1e-12)


def test_quat_matrix_roundtrip_vs_scipy(rng):
    q = random_quats(rng, 64)
    R = lie.quat_to_matrix(jnp.asarray(q))
    # scipy uses [x,y,z,w]
    R_scipy = Rotation.from_quat(np.roll(q, -1, axis=-1)).as_matrix()
    np.testing.assert_allclose(np.asarray(R), R_scipy, atol=1e-12)
    q_back = np.asarray(lie.matrix_to_quat(R))
    sign = np.sign(np.sum(q_back * q, axis=-1, keepdims=True))
    np.testing.assert_allclose(q_back, q * sign, atol=1e-10)


def test_exp_log_roundtrip(rng):
    theta = rng.normal(size=(64, 3))
    # include tiny and near-pi angles
    theta[0] = [1e-12, 0, 0]
    theta[1] = [0, 0, 0]
    theta[2] = theta[2] / np.linalg.norm(theta[2]) * 3.1
    q = lie.so3_exp_quat(jnp.asarray(theta))
    theta_back = np.asarray(lie.quat_log(q))
    np.testing.assert_allclose(theta_back, theta, atol=1e-9)


def test_exp_matches_scipy(rng):
    theta = rng.normal(size=(32, 3))
    R = lie.so3_exp(jnp.asarray(theta))
    np.testing.assert_allclose(np.asarray(R),
                               Rotation.from_rotvec(theta).as_matrix(),
                               atol=1e-12)


def test_log_matrix(rng):
    theta = rng.normal(size=(32, 3)) * 0.5
    R = Rotation.from_rotvec(theta).as_matrix()
    np.testing.assert_allclose(np.asarray(lie.so3_log(jnp.asarray(R))),
                               theta, atol=1e-9)


def test_right_jacobian_finite_difference(rng):
    theta = rng.normal(size=(8, 3))
    Jr = np.asarray(lie.so3_right_jacobian(jnp.asarray(theta)))
    eps = 1e-7
    for k in range(8):
        for i in range(3):
            d = np.zeros(3)
            d[i] = eps
            Rp = Rotation.from_rotvec(theta[k] + d).as_matrix()
            R0 = Rotation.from_rotvec(theta[k]).as_matrix()
            dtheta = Rotation.from_matrix(R0.T @ Rp).as_rotvec()
            np.testing.assert_allclose(dtheta / eps, Jr[k][:, i], atol=1e-5)


def test_jacobian_inverse(rng):
    theta = rng.normal(size=(16, 3))
    Jl = np.asarray(lie.so3_left_jacobian(jnp.asarray(theta)))
    Jli = np.asarray(lie.so3_left_jacobian_inv(jnp.asarray(theta)))
    np.testing.assert_allclose(Jl @ Jli,
                               np.broadcast_to(np.eye(3), (16, 3, 3)),
                               atol=1e-9)


def test_pose_compose_inverse(rng):
    q1, q2 = random_quats(rng, 8), random_quats(rng, 8)
    p1, p2 = rng.normal(size=(8, 3)), rng.normal(size=(8, 3))
    pc, qc = lie.pose_compose(jnp.asarray(p1), jnp.asarray(q1),
                              jnp.asarray(p2), jnp.asarray(q2))
    pi, qi = lie.pose_inverse(pc, qc)
    p_id, q_id = lie.pose_compose(pc, qc, pi, qi)
    np.testing.assert_allclose(np.asarray(p_id), 0.0, atol=1e-12)
    np.testing.assert_allclose(np.abs(np.asarray(q_id)[:, 0]), 1.0, atol=1e-12)


def test_boxplus_boxminus_roundtrip(rng):
    q = random_quats(rng, 8)
    p = rng.normal(size=(8, 3))
    dx = rng.normal(size=(8, 6)) * 0.3
    p1, q1 = lie.pose_boxplus(jnp.asarray(p), jnp.asarray(q), jnp.asarray(dx))
    dx_back = lie.pose_boxminus(p1, q1, jnp.asarray(p), jnp.asarray(q))
    np.testing.assert_allclose(np.asarray(dx_back), dx, atol=1e-9)


def test_g2R_aligns_gravity(rng):
    g = rng.normal(size=(8, 3))
    g = g / np.linalg.norm(g, axis=-1, keepdims=True) * 9.81
    R0 = np.asarray(lie.g2R(jnp.asarray(g)))
    aligned = np.einsum("nij,nj->ni", R0, g)
    np.testing.assert_allclose(aligned[:, :2], 0.0, atol=1e-6)
    np.testing.assert_allclose(aligned[:, 2], 9.81, atol=1e-6)
    # yaw of R0 is zero
    yaw = np.arctan2(R0[:, 1, 0], R0[:, 0, 0])
    np.testing.assert_allclose(yaw, 0.0, atol=1e-6)


def test_yaw_roundtrip(rng):
    yaw = rng.uniform(-np.pi, np.pi, size=(16,))
    q = lie.quat_from_yaw(jnp.asarray(yaw))
    np.testing.assert_allclose(np.asarray(lie.yaw_from_quat(q)), yaw,
                               atol=1e-12)


def test_camera_project_lift_roundtrip(rng):
    from dynamic_vins_tpu.geometry import camera

    intr = camera.PinholeIntrinsics.make(
        458.654, 457.296, 367.215, 248.375,
        k1=-0.28340811, k2=0.07395907, p1=0.00019359, p2=1.76187114e-05,
        dtype=jnp.float64)
    pts = rng.uniform(-1, 1, size=(128, 3))
    pts[:, 2] = rng.uniform(2.0, 10.0, size=128)
    uv = camera.project(intr, jnp.asarray(pts))
    ray = camera.lift(intr, uv, num_iters=12)
    xy_expected = pts[:, :2] / pts[:, 2:3]
    np.testing.assert_allclose(np.asarray(ray[:, :2]), xy_expected, atol=1e-7)


def test_equidistant_camera_roundtrip(rng):
    from dynamic_vins_tpu.geometry import camera

    intr = camera.EquidistantIntrinsics.make(
        380.8, 380.3, 510.0, 514.0,
        k2=-0.01, k3=0.02, k4=-0.02, k5=0.005, dtype=jnp.float64)
    pts = rng.uniform(-1.5, 1.5, size=(128, 3))
    pts[:, 2] = rng.uniform(0.5, 10.0, size=128)
    uv = camera.equidistant_project(intr, jnp.asarray(pts))
    ray = camera.equidistant_lift(intr, uv, num_iters=12)
    ray_gt = pts / np.linalg.norm(pts, axis=-1, keepdims=True)
    np.testing.assert_allclose(np.asarray(ray), ray_gt, atol=1e-8)


def test_cata_camera_roundtrip():
    """MEI model: project(lift(uv)) == uv across the image."""
    from dynamic_vins_tpu.geometry import camera
    import itertools

    intr = camera.CataIntrinsics.make(
        0.9, 360.0, 362.0, 376.0, 240.0, k1=-0.1, k2=0.02, p1=1e-4,
        p2=-2e-4, dtype=jnp.float64)
    uv = jnp.asarray([[u, v] for u, v in itertools.product(
        [40.0, 376.0, 700.0], [40.0, 240.0, 430.0])], jnp.float64)
    ray = camera.cata_lift(intr, uv, num_iters=12)
    assert np.allclose(np.linalg.norm(np.asarray(ray), axis=-1), 1.0)
    uv2 = camera.cata_project(intr, ray * 3.0)   # scale-invariant
    assert np.allclose(np.asarray(uv2), np.asarray(uv), atol=1e-5)


def test_scaramuzza_camera_roundtrip():
    from dynamic_vins_tpu.geometry import camera

    # a typical OCamCalib fisheye polynomial (z' = a0 + a2 rho^2 + ...)
    poly = [-250.0, 0.0, 1.2e-3, -2.0e-7, 1.0e-10]
    inv = camera.scaramuzza_fit_inverse(poly, max_rho=380.0)
    intr = camera.ScaramuzzaIntrinsics.make(
        poly, inv, 400.0, 300.0, c=1.001, d=1e-4, e=-2e-4,
        dtype=jnp.float64)
    uv = jnp.asarray([[150.0, 120.0], [400.0, 300.0], [620.0, 450.0],
                      [90.0, 500.0]], jnp.float64)
    ray = camera.scaramuzza_lift(intr, uv)
    assert np.all(np.asarray(ray)[:, 2] > 0)     # forward-looking
    uv2 = camera.scaramuzza_project(intr, ray * 5.0)
    assert np.allclose(np.asarray(uv2), np.asarray(uv), atol=0.05)
