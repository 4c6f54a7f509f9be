"""Camera intrinsic calibration (camodocal CameraCalibration parity)."""

import numpy as np
import pytest

from dynamic_vins_tpu.geometry import calibration as cal


def _synth_views(fx=480.0, fy=470.0, cx=320.0, cy=240.0,
                 dist=(0.05, -0.02, 0.001, -0.0005), n_views=8, seed=0):
    import jax.numpy as jnp

    from dynamic_vins_tpu.geometry import camera as cam
    from dynamic_vins_tpu.geometry import lie

    intr = cam.PinholeIntrinsics.make(fx, fy, cx, cy, *dist,
                                      dtype=jnp.float64)
    # 7x5 board, 30 mm squares
    gx, gy = np.meshgrid(np.arange(7) * 0.03, np.arange(5) * 0.03)
    obj = np.stack([gx.ravel(), gy.ravel()], axis=1)
    obj -= obj.mean(axis=0)
    rng = np.random.default_rng(seed)
    views = []
    poses = []
    for _ in range(n_views):
        rv = rng.normal(scale=0.25, size=3)
        rv[2] = rng.normal(scale=0.6)
        t = np.array([rng.normal(scale=0.05), rng.normal(scale=0.05),
                      0.5 + 0.3 * rng.random()])
        q = lie.so3_exp_quat(jnp.asarray(rv))
        p3 = np.concatenate([obj, np.zeros((len(obj), 1))], axis=1)
        pc = np.asarray(lie.quat_rotate(q[None, :], jnp.asarray(p3))) + t
        uv = np.asarray(cam.project(intr, jnp.asarray(pc)))
        views.append((obj.copy(), uv))
        poses.append((rv, t))
    return views, poses


def test_homography_dlt_exact():
    rng = np.random.default_rng(1)
    H_gt = np.array([[1.2, 0.1, 30.0], [-0.05, 0.9, 20.0],
                     [1e-4, -2e-4, 1.0]])
    obj = rng.uniform(-1, 1, (20, 2))
    ph = np.concatenate([obj, np.ones((20, 1))], axis=1)
    proj = (H_gt @ ph.T).T
    img = proj[:, :2] / proj[:, 2:3]
    H = cal.homography_dlt(obj, img)
    np.testing.assert_allclose(H, H_gt / H_gt[2, 2], atol=1e-8)


def test_calibrate_planar_recovers_intrinsics():
    views, _ = _synth_views()
    res = cal.calibrate_planar(views)
    assert res.rms < 0.05, res.rms
    assert abs(res.fx - 480.0) < 1.0, res.fx
    assert abs(res.fy - 470.0) < 1.0, res.fy
    assert abs(res.cx - 320.0) < 1.0, res.cx
    assert abs(res.cy - 240.0) < 1.0, res.cy
    np.testing.assert_allclose(res.dist, [0.05, -0.02, 0.001, -0.0005],
                               atol=2e-3)


def test_calibrate_noisy_corners():
    views, _ = _synth_views(seed=3)
    rng = np.random.default_rng(4)
    noisy = [(o, i + rng.normal(scale=0.1, size=i.shape))
             for o, i in views]
    res = cal.calibrate_planar(noisy)
    assert res.rms < 0.25
    assert abs(res.fx - 480.0) < 5.0
    assert abs(res.cy - 240.0) < 5.0
