"""Monocular SfM + visual-inertial alignment initialization tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from dynamic_vins_tpu.estimator import initializer
from dynamic_vins_tpu.geometry import lie, lie_np
from dynamic_vins_tpu.imu import preintegration as pre
from dynamic_vins_tpu.sim import synthetic as sim

cv2 = pytest.importorskip("cv2")


def _mono_world(F=8, n_lm=120, seed=0):
    """Camera-frame observations of static landmarks (mono, left cam)."""
    seq = sim.generate_sequence(num_frames=F, imu_hz=200.0,
                                num_landmarks=n_lm, seed=seed)
    rig = seq.rig
    obs = {}
    cam_R = []   # camera->world
    cam_p = []
    for k in range(F):
        p_wc, q_wc = lie.pose_compose(seq.gt_p[k], seq.gt_q[k],
                                      rig.p_bc, rig.q_bc)
        cam_R.append(np.asarray(lie.quat_to_matrix(q_wc)))
        cam_p.append(np.asarray(p_wc))
        p_cw, q_cw = lie.pose_inverse(p_wc, q_wc)
        pts_c = np.asarray(lie.pose_transform_point(
            p_cw[None, :], q_cw[None, :], seq.landmarks))
        for l in range(n_lm):
            pc = pts_c[l]
            if pc[2] < 0.5:
                continue
            xy = pc[:2] / pc[2]
            if abs(xy[0]) > 0.8 or abs(xy[1]) > 0.55:
                continue
            obs.setdefault(l, {})[k] = xy
    return seq, obs, cam_R, cam_p, rig


def test_relative_pose_from_essential():
    seq, obs, cam_R, cam_p, rig = _mono_world()
    F = 8
    pts_i, pts_j = [], []
    for fid, fo in obs.items():
        if 0 in fo and F - 1 in fo:
            pts_i.append(fo[0])
            pts_j.append(fo[F - 1])
    res = initializer.solve_relative_pose(pts_i, pts_j)
    assert res is not None
    R_rel, t_rel, ratio = res
    assert ratio > 0.7
    # ground-truth relative pose of camera F-1 in camera 0 frame
    R_gt = cam_R[0].T @ cam_R[F - 1]
    t_gt = cam_R[0].T @ (cam_p[F - 1] - cam_p[0])
    np.testing.assert_allclose(R_rel, R_gt, atol=5e-3)
    cos = np.dot(t_rel, t_gt) / (np.linalg.norm(t_rel)
                                 * np.linalg.norm(t_gt))
    assert cos > 0.999


def test_sfm_construct_recovers_poses():
    seq, obs, cam_R, cam_p, rig = _mono_world()
    F = 8
    pts_i = [fo[0] for fo in obs.values() if 0 in fo and F - 1 in fo]
    pts_j = [fo[F - 1] for fo in obs.values() if 0 in fo and F - 1 in fo]
    R_rel, t_rel, _ = initializer.solve_relative_pose(pts_i, pts_j)
    ok, R, p, points = initializer.sfm_construct(F, obs, 0, R_rel,
                                                 t_rel)
    assert ok
    # compare up to the global scale: true scale
    t_gt = cam_R[0].T @ (cam_p[F - 1] - cam_p[0])
    s = np.linalg.norm(t_gt)   # |t_rel| == 1 from recoverPose
    for k in range(F):
        R_gt_k = cam_R[0].T @ cam_R[k]
        p_gt_k = cam_R[0].T @ (cam_p[k] - cam_p[0])
        np.testing.assert_allclose(R[k], R_gt_k, atol=2e-2)
        np.testing.assert_allclose(np.asarray(p[k]) * s, p_gt_k,
                                   atol=0.05 * s + 1e-3)


def test_visual_inertial_alignment():
    seq, obs, cam_R, cam_p, rig = _mono_world()
    F = 8
    pts_i = [fo[0] for fo in obs.values() if 0 in fo and F - 1 in fo]
    pts_j = [fo[F - 1] for fo in obs.values() if 0 in fo and F - 1 in fo]
    R_rel, t_rel, _ = initializer.solve_relative_pose(pts_i, pts_j)
    ok, R_sfm, p_sfm, points = initializer.sfm_construct(F, obs, 0,
                                                         R_rel, t_rel)
    assert ok

    # exact preintegration per edge (zero noise/bias)
    ipf = 20
    zeros = jnp.zeros(3, dtype=jnp.float64)
    pres = []
    dt_edges = []
    for k in range(F - 1):
        a, b = k * ipf, (k + 1) * ipf
        P = pre.preintegrate(seq.acc[a:b + 1], seq.gyr[a:b + 1],
                             jnp.diff(seq.imu_times[a:b + 1]),
                             zeros, zeros)
        pres.append(dict(delta_p=np.asarray(P.delta_p),
                         delta_v=np.asarray(P.delta_v)))
        dt_edges.append(float(P.sum_dt))

    # body rotations in the c0 (SfM reference camera) frame:
    # R_c0_b = R_sfm (cam k in c0) * R_cb
    R_bc = np.asarray(lie.quat_to_matrix(rig.q_bc))
    p_bc = np.asarray(rig.p_bc)
    R_c0b = [R_sfm[k] @ R_bc.T for k in range(F)]
    # body positions (unscaled, c0 frame): p_cam - R_c0b @ p_bc
    p_c0b_unscaled = [np.asarray(p_sfm[k]) for k in range(F)]

    ok2, v, g, s = initializer.solve_gravity_velocity_scale(
        pres, R_c0b, p_c0b_unscaled, p_bc, dt_edges)
    assert ok2, "alignment failed"
    # true scale: SfM |t| between frames 0 and F-1 was normalized to 1
    t_gt = cam_R[0].T @ (cam_p[F - 1] - cam_p[0])
    s_true = np.linalg.norm(t_gt)
    np.testing.assert_allclose(s, s_true, rtol=0.05)
    # gravity direction in c0 frame
    g_true = cam_R[0].T @ np.array([0.0, 0.0, 9.81])
    cos = np.dot(g, g_true) / (np.linalg.norm(g) * 9.81)
    assert cos > 0.99, (g, g_true)

    # refine on the sphere
    v2, g2, s2 = initializer.refine_gravity(pres, R_c0b,
                                            p_c0b_unscaled, p_bc,
                                            dt_edges, g)
    cos2 = np.dot(g2, g_true) / (np.linalg.norm(g2) * 9.81)
    assert cos2 >= cos - 1e-9
    np.testing.assert_allclose(np.linalg.norm(g2), 9.81, atol=1e-9)
    np.testing.assert_allclose(s2, s_true, rtol=0.05)

    # velocities: v_k are body-frame; compare with truth
    for k in range(0, F, 3):
        v_w_true = np.asarray(sim.state_at(seq.frame_times[k])[2])
        v_w_est = cam_R[0] @ (R_c0b[k] @ v[k])
        np.testing.assert_allclose(v_w_est, v_w_true, atol=0.15)
