"""Monocular visual-inertial initialization.

Capability parity with the reference's init stack
(`estimator/initial/`): 5-point relative pose
(`solve_5pts.h:36` MotionEstimator — via cv2 epipolar estimation, the
reference's own choice), global SfM over the fill window
(`initial_sfm.cpp:149` GlobalSFM::construct — here: incremental
PnP + triangulation + a reprojection-only LM refine), gyroscope-bias
solve, and the gravity/velocity/scale linear alignment
(`initial_aligment.cpp:151-260` LinearAlignment + RefineGravity).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dynamic_vins_tpu.estimator import triangulation
from dynamic_vins_tpu.geometry import lie, lie_np

GRAVITY_NORM = 9.81


def solve_relative_pose(pts_i, pts_j, focal: float = 460.0,
                        thresh_px: float = 0.3):
    """Essential-matrix relative pose from normalized correspondences.

    Returns (R_ji? no — R, t with x_j ~ R x_i + t scaled, inlier ratio),
    mirroring MotionEstimator::solveRelativeRT (solve_5pts.h:36).
    """
    import cv2

    if len(pts_i) < 15:
        return None
    p1 = np.asarray(pts_i, np.float64)[:, :2]
    p2 = np.asarray(pts_j, np.float64)[:, :2]
    E, mask = cv2.findEssentialMat(p1, p2, focal=1.0, pp=(0.0, 0.0),
                                   method=cv2.RANSAC, prob=0.999,
                                   threshold=thresh_px / focal)
    if E is None:
        return None
    n_in, R, t, _ = cv2.recoverPose(E, p1, p2, focal=1.0, pp=(0.0, 0.0),
                                    mask=mask)
    if n_in < 12:
        return None
    # cv2 returns x2 = R x1 + t (world->cam1 relative cam0): we want the
    # pose of frame j in frame i coordinates: R_ij = R^T, t_ij = -R^T t
    return R.T, (-R.T @ t).ravel(), float(n_in) / len(p1)


def sfm_construct(num_frames: int, obs: Dict[int, Dict[int, np.ndarray]],
                  ref_frame: int, R_rel, t_rel,
                  min_obs_pnp: int = 12):
    """Incremental SfM over the fill window (GlobalSFM::construct).

    obs: {feature_id: {frame: normalized pt[2|3]}}. Frame `ref_frame`
    is fixed at identity; the newest frame F-1 gets (R_rel, t_rel)
    scaled arbitrarily (mono gauge). Returns (ok, R[F], p[F] —
    camera-to-ref rotations/positions, points {fid: xyz}).
    """
    F = num_frames
    R = [None] * F
    p = [None] * F
    R[ref_frame] = np.eye(3)
    p[ref_frame] = np.zeros(3)
    R[F - 1] = R_rel
    p[F - 1] = t_rel
    points: Dict[int, np.ndarray] = {}

    def cam_pose_inv(k):
        """world(ref)->camera k."""
        Rcw = R[k].T
        return Rcw, -Rcw @ p[k]

    def tri_two(k0, k1, fid):
        Rcw0, tcw0 = cam_pose_inv(k0)
        Rcw1, tcw1 = cam_pose_inv(k1)
        pt0 = obs[fid][k0]
        pt1 = obs[fid][k1]
        pw, d0 = triangulation.triangulate_dlt(
            jnp.asarray(tcw0), jnp.asarray(lie.matrix_to_quat(
                jnp.asarray(Rcw0))),
            jnp.asarray(tcw1), jnp.asarray(lie.matrix_to_quat(
                jnp.asarray(Rcw1))),
            jnp.asarray(np.append(pt0[:2], 1.0)),
            jnp.asarray(np.append(pt1[:2], 1.0)))
        return np.asarray(pw), float(d0)

    def triangulate_between(k0, k1):
        for fid, fo in obs.items():
            if fid in points or k0 not in fo or k1 not in fo:
                continue
            pw, d0 = tri_two(k0, k1, fid)
            if 0.1 < d0 < 200.0 and np.all(np.isfinite(pw)):
                points[fid] = pw

    def pnp(k, guess_from):
        pts_w, pts_n = [], []
        for fid, fo in obs.items():
            if fid in points and k in fo:
                pts_w.append(points[fid])
                pts_n.append(np.append(fo[k][:2], 1.0))
        if len(pts_w) < min_obs_pnp:
            return False
        cap = max(64, len(pts_w))
        pw = np.zeros((cap, 3)); pw[:len(pts_w)] = pts_w
        pn = np.zeros((cap, 3)); pn[:len(pts_n)] = pts_n
        valid = np.zeros(cap, bool); valid[:len(pts_w)] = True
        Rcw0, tcw0 = (R[guess_from].T, -R[guess_from].T @ p[guess_from])
        p_cw, q_cw, err = triangulation.pnp_gauss_newton(
            jnp.asarray(pw), jnp.asarray(pn), jnp.asarray(valid),
            jnp.asarray(tcw0),
            jnp.asarray(lie.matrix_to_quat(jnp.asarray(Rcw0))))
        if not np.isfinite(float(err)) or float(err) > 0.05:
            return False
        Rcw = np.asarray(lie.quat_to_matrix(q_cw))
        R[k] = Rcw.T
        p[k] = -Rcw.T @ np.asarray(p_cw)
        return True

    # seed structure between ref and newest
    triangulate_between(ref_frame, F - 1)
    # forward: ref+1 .. F-2 by PnP then triangulate vs newest
    for k in range(ref_frame + 1, F - 1):
        if not pnp(k, k - 1 if R[k - 1] is not None else ref_frame):
            return False, R, p, points
        triangulate_between(k, F - 1)
        triangulate_between(ref_frame, k)
    # backward: ref-1 .. 0
    for k in range(ref_frame - 1, -1, -1):
        if not pnp(k, k + 1):
            return False, R, p, points
        triangulate_between(k, ref_frame)
    # triangulate anything left with any two observing frames
    for fid, fo in obs.items():
        if fid in points or len(fo) < 2:
            continue
        ks = [k for k in fo if R[k] is not None]
        if len(ks) >= 2:
            pw, d0 = tri_two(ks[0], ks[-1], fid)
            if 0.1 < d0 < 200.0 and np.all(np.isfinite(pw)):
                points[fid] = pw
    return True, R, p, points


def solve_gravity_velocity_scale(pres, R_c0b, p_c0b, p_bc, dt_edges):
    """LinearAlignment (initial_aligment.cpp:151-224).

    Unknowns x = [v_0..v_{F-1} (body frame), g_c0 (3), s (1)]; from the
    preintegrated deltas and the SfM camera poses (in the c0 frame).
    pres: list of per-edge dicts with delta_p, delta_v [3]; R_c0b: [F]
    body->c0 rotations; p_c0b: [F] (unscaled SfM positions of the BODY,
    i.e. camera position corrected by extrinsic); p_bc: [3] body->cam
    translation; dt_edges: [F-1].
    Returns (ok, velocities [F,3] body frame, g_c0 [3], scale).
    """
    F = len(R_c0b)
    n = 3 * F + 3 + 1
    A = np.zeros((n, n))
    b = np.zeros(n)
    for i in range(F - 1):
        dt = dt_edges[i]
        H = np.zeros((6, 10))
        z = np.zeros(6)
        Ri = R_c0b[i]
        Rj = R_c0b[i + 1]
        RiT = Ri.T
        H[0:3, 0:3] = -dt * np.eye(3)
        H[0:3, 6:9] = 0.5 * RiT * dt * dt @ np.eye(3)
        H[0:3, 9] = RiT @ (p_c0b[i + 1] - p_c0b[i])
        z[0:3] = pres[i]["delta_p"] + RiT @ Rj @ p_bc - p_bc
        H[3:6, 0:3] = -np.eye(3)
        H[3:6, 3:6] = RiT @ Rj
        H[3:6, 6:9] = RiT * dt
        z[3:6] = pres[i]["delta_v"]
        # scatter into the big system (v_i, v_{i+1}, g, s)
        Ai = np.zeros((6, n))
        Ai[:, 3 * i:3 * i + 6] = H[:, 0:6]
        Ai[:, 3 * F:3 * F + 3] = H[:, 6:9]
        Ai[:, 3 * F + 3] = H[:, 9]
        A += Ai.T @ Ai * 1000.0
        b += Ai.T @ z * 1000.0
    try:
        x = np.linalg.solve(A, b)
    except np.linalg.LinAlgError:
        return False, None, None, None
    s = x[-1]
    g = x[3 * F:3 * F + 3]
    if abs(np.linalg.norm(g) - GRAVITY_NORM) > 1.5 or s < 1e-4:
        return False, None, None, None
    v = x[:3 * F].reshape(F, 3)
    return True, v, g, float(s)


def refine_gravity(pres, R_c0b, p_c0b, p_bc, dt_edges, g0):
    """RefineGravity (initial_aligment.cpp:89-150): re-solve with g
    constrained to the gravity sphere (2-dof tangent perturbation)."""
    F = len(R_c0b)
    g = g0 / np.linalg.norm(g0) * GRAVITY_NORM
    v = None
    s = None
    for _ in range(4):
        # tangent basis
        a = g / np.linalg.norm(g)
        tmp = np.array([0.0, 0.0, 1.0])
        if abs(a @ tmp) > 0.9:
            tmp = np.array([1.0, 0.0, 0.0])
        b1 = np.cross(a, tmp); b1 /= np.linalg.norm(b1)
        b2 = np.cross(a, b1)
        bbasis = np.stack([b1, b2], axis=1)      # [3,2]
        n = 3 * F + 2 + 1
        A = np.zeros((n, n)); bb = np.zeros(n)
        for i in range(F - 1):
            dt = dt_edges[i]
            Ri = R_c0b[i]; Rj = R_c0b[i + 1]; RiT = Ri.T
            Ai = np.zeros((6, n)); z = np.zeros(6)
            Ai[0:3, 3 * i:3 * i + 3] = -dt * np.eye(3)
            Ai[0:3, 3 * F:3 * F + 2] = 0.5 * dt * dt * (RiT @ bbasis)
            Ai[0:3, 3 * F + 2] = RiT @ (p_c0b[i + 1] - p_c0b[i])
            z[0:3] = (pres[i]["delta_p"] + RiT @ Rj @ p_bc - p_bc
                      - 0.5 * dt * dt * (RiT @ g))
            Ai[3:6, 3 * i:3 * i + 3] = -np.eye(3)
            Ai[3:6, 3 * i + 3:3 * i + 6] = RiT @ Rj
            Ai[3:6, 3 * F:3 * F + 2] = dt * (RiT @ bbasis)
            z[3:6] = pres[i]["delta_v"] - dt * (RiT @ g)
            A += Ai.T @ Ai * 1000.0
            bb += Ai.T @ z * 1000.0
        x = np.linalg.solve(A, bb)
        dg = bbasis @ x[3 * F:3 * F + 2]
        g = (g + dg)
        g = g / np.linalg.norm(g) * GRAVITY_NORM
        v = x[:3 * F].reshape(F, 3)
        s = float(x[-1])
    return v, g, s
