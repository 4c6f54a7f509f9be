"""Triangulation and PnP primitives (JAX, batched).

Capability parity with the reference's `vio_util`
(`estimator/vio_util.cpp:30-114` DLT triangulation, `:637` SolvePoseByPnP)
and `FeatureManager::TriangulatePoints` (feature_manager.cpp:244-335).
Rebuilt as vmappable fixed-iteration kernels (GN PnP instead of OpenCV).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from dynamic_vins_tpu.geometry import lie


def triangulate_dlt(p_cw0, q_cw0, p_cw1, q_cw1, pt0, pt1):
    """Two-view DLT triangulation.

    (p_cw, q_cw) are world->camera transforms; pt are normalized image
    coords [,3] with z=1. Returns the world point [3] and the depth in
    camera 0. Mirrors `vio_util.cpp:30-56` (SVD of the 4x4 design matrix).
    """
    R0 = lie.quat_to_matrix(q_cw0)
    R1 = lie.quat_to_matrix(q_cw1)
    P0 = jnp.concatenate([R0, p_cw0[:, None]], axis=1)   # [3,4]
    P1 = jnp.concatenate([R1, p_cw1[:, None]], axis=1)
    A = jnp.stack([
        pt0[0] * P0[2] - P0[0],
        pt0[1] * P0[2] - P0[1],
        pt1[0] * P1[2] - P1[0],
        pt1[1] * P1[2] - P1[1],
    ])
    _, _, vt = jnp.linalg.svd(A)
    X = vt[-1]
    pw = X[:3] / X[3]
    depth0 = R0[2] @ pw + p_cw0[2]
    return pw, depth0


def triangulate_batch(p_cw0, q_cw0, p_cw1, q_cw1, pt0, pt1):
    return jax.vmap(triangulate_dlt)(p_cw0, q_cw0, p_cw1, q_cw1, pt0, pt1)


def pnp_gauss_newton(pts_w, pts_norm, valid, p_cw0, q_cw0,
                     num_iters: int = 10, huber: float = 0.01):
    """Camera pose from 3D-2D correspondences by robust Gauss-Newton.

    pts_w: [N,3] world points; pts_norm: [N,3] normalized obs (z=1);
    valid: [N] bool. Initial guess (p_cw0, q_cw0) world->camera.
    Replaces cv::solvePnP (`vio_util.cpp:637`) with a fixed-iteration,
    jit-safe solver. Returns (p_cw, q_cw, mean_reproj_err).
    """
    dtype = pts_w.dtype

    def residual(delta, p_cw, q_cw):
        p2, q2 = lie.pose_boxplus(p_cw, q_cw, delta)
        pc = lie.quat_rotate(q2[None, :], pts_w) + p2[None, :]
        z = jnp.maximum(pc[:, 2:3], 1e-6)
        r = pc[:, :2] / z - pts_norm[:, :2]
        return r

    def step(carry, _):
        p_cw, q_cw = carry
        zero = jnp.zeros((6,), dtype)
        r = residual(zero, p_cw, q_cw)                 # [N,2]
        J = jax.jacfwd(residual)(zero, p_cw, q_cw)     # [N,2,6]
        rn = jnp.linalg.norm(r, axis=-1)
        w = jnp.where(rn > huber, huber / jnp.maximum(rn, 1e-12), 1.0)
        w = jnp.where(valid, w, 0.0)[:, None]
        rw = (r * w).reshape(-1)
        Jw = (J * w[..., None]).reshape(-1, 6)
        H = Jw.T @ Jw + 1e-8 * jnp.eye(6, dtype=dtype)
        g = Jw.T @ rw
        delta = -jnp.linalg.solve(H, g)
        p2, q2 = lie.pose_boxplus(p_cw, q_cw, delta)
        return (p2, q2), None

    (p_cw, q_cw), _ = jax.lax.scan(step, (p_cw0, q_cw0), None,
                                   length=num_iters)
    r = residual(jnp.zeros((6,), dtype), p_cw, q_cw)
    err = jnp.linalg.norm(r, axis=-1)
    nv = jnp.maximum(jnp.sum(valid), 1)
    mean_err = jnp.sum(jnp.where(valid, err, 0.0)) / nv
    return p_cw, q_cw, mean_err


def solve_gyro_bias(dq_dbg, q_meas, q_est):
    """Linear gyroscope-bias estimate (initial_aligment.cpp:29-60).

    dq_dbg: [E,3,3] preintegration rotation-bias Jacobians;
    q_meas: [E,4] preintegrated delta rotations;
    q_est:  [E,4] visual relative rotations q_i^-1 q_j.
    Returns delta_bg [3].
    """
    # residual rotation: 2 * vec(q_meas^-1 ⊗ q_est)
    dq = lie.quat_multiply(lie.quat_conjugate(q_meas), q_est)
    b_rows = 2.0 * dq[:, 1:]
    A = jnp.einsum("eij,eik->jk", dq_dbg, dq_dbg)
    b = jnp.einsum("eij,ei->j", dq_dbg, b_rows)
    return jnp.linalg.solve(A + 1e-8 * jnp.eye(3, dtype=A.dtype), b)
