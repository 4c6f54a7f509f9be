"""Camera intrinsic calibration from planar targets (Zhang's method).

Capability parity with the camodocal calibration tool shipped in the
reference's `camera_models` package (`camera_models/src/calib/
CameraCalibration.cc` + `intrinsic_calib.cc`: chessboard corners ->
closed-form intrinsics -> nonlinear refinement). TPU-first twist: the
refinement stage is a jitted Gauss-Newton whose per-view reprojection
Jacobians come from one `vmap`ed `jacfwd` — all views in one batch.

Input: a list of views; each view is (object_pts [N,2] board-plane
coordinates, image_pts [N,2] detected pixel corners).
"""

from __future__ import annotations

from typing import List, NamedTuple, Tuple

import numpy as np


class CalibrationResult(NamedTuple):
    fx: float
    fy: float
    cx: float
    cy: float
    dist: np.ndarray          # [4] k1 k2 p1 p2
    rms: float                # reprojection RMS (px)
    rvecs: np.ndarray         # [V,3] per-view rotations (axis-angle)
    tvecs: np.ndarray         # [V,3]


def _normalize_pts(pts):
    """Hartley normalization: zero mean, mean distance sqrt(2)."""
    c = pts.mean(axis=0)
    d = np.sqrt(((pts - c) ** 2).sum(axis=1)).mean()
    s = np.sqrt(2.0) / max(d, 1e-12)
    T = np.array([[s, 0, -s * c[0]], [0, s, -s * c[1]], [0, 0, 1.0]])
    ph = np.concatenate([pts, np.ones((len(pts), 1))], axis=1)
    return (T @ ph.T).T[:, :2], T


def homography_dlt(obj_pts, img_pts):
    """Planar homography via normalized DLT (8-dof, SVD)."""
    op, To = _normalize_pts(np.asarray(obj_pts, float))
    ip, Ti = _normalize_pts(np.asarray(img_pts, float))
    n = len(op)
    A = np.zeros((2 * n, 9))
    for i in range(n):
        X, Y = op[i]
        u, v = ip[i]
        A[2 * i] = [-X, -Y, -1, 0, 0, 0, u * X, u * Y, u]
        A[2 * i + 1] = [0, 0, 0, -X, -Y, -1, v * X, v * Y, v]
    _, _, Vt = np.linalg.svd(A)
    Hn = Vt[-1].reshape(3, 3)
    H = np.linalg.inv(Ti) @ Hn @ To
    return H / H[2, 2]


def _v_ij(H, i, j):
    return np.array([
        H[0, i] * H[0, j],
        H[0, i] * H[1, j] + H[1, i] * H[0, j],
        H[1, i] * H[1, j],
        H[2, i] * H[0, j] + H[0, i] * H[2, j],
        H[2, i] * H[1, j] + H[1, i] * H[2, j],
        H[2, i] * H[2, j]])


def intrinsics_from_homographies(Hs: List[np.ndarray]):
    """Zhang closed form: B = K^-T K^-1 from the v_ij constraints."""
    V = []
    for H in Hs:
        V.append(_v_ij(H, 0, 1))
        V.append(_v_ij(H, 0, 0) - _v_ij(H, 1, 1))
    V = np.stack(V)
    _, _, Vt = np.linalg.svd(V)
    b11, b12, b22, b13, b23, b33 = Vt[-1]
    cy = (b12 * b13 - b11 * b23) / (b11 * b22 - b12 * b12)
    lam = b33 - (b13 * b13 + cy * (b12 * b13 - b11 * b23)) / b11
    fx = np.sqrt(abs(lam / b11))
    fy = np.sqrt(abs(lam * b11 / (b11 * b22 - b12 * b12)))
    cx = -b13 * fx * fx / lam
    return fx, fy, cx, cy


def extrinsics_from_homography(H, K):
    """Per-view [R|t] from K^-1 H with orthonormalization."""
    Kinv = np.linalg.inv(K)
    h1, h2, h3 = H[:, 0], H[:, 1], H[:, 2]
    lam = 1.0 / max(np.linalg.norm(Kinv @ h1), 1e-12)
    r1 = lam * (Kinv @ h1)
    r2 = lam * (Kinv @ h2)
    t = lam * (Kinv @ h3)
    r3 = np.cross(r1, r2)
    R = np.stack([r1, r2, r3], axis=1)
    # closest rotation (SVD polar)
    U, _, Vt = np.linalg.svd(R)
    R = U @ Vt
    if np.linalg.det(R) < 0:
        R = -R
    if t[2] < 0:                         # board must be in front
        R[:, 0] *= -1
        R[:, 1] *= -1
        t = -t
    return R, t


def calibrate_planar(views: List[Tuple[np.ndarray, np.ndarray]],
                     refine_iters: int = 12) -> CalibrationResult:
    """Full pipeline: DLT homographies -> Zhang intrinsics -> per-view
    extrinsics -> batched GN refinement of (K, dist, all poses)."""
    Hs = [homography_dlt(o, i) for o, i in views]
    fx, fy, cx, cy = intrinsics_from_homographies(Hs)
    K = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1.0]])

    rvecs, tvecs = [], []
    for H in Hs:
        R, t = extrinsics_from_homography(H, K)
        # axis-angle from R
        import jax.numpy as jnp

        from dynamic_vins_tpu.geometry import lie
        rv = np.asarray(lie.quat_log(lie.matrix_to_quat(jnp.asarray(R))))
        rvecs.append(rv)
        tvecs.append(t)
    rvecs = np.stack(rvecs)
    tvecs = np.stack(tvecs)

    # pad views to a common N for one static-shape batched refinement
    N = max(len(o) for o, _ in views)
    Vn = len(views)
    obj = np.zeros((Vn, N, 2))
    img = np.zeros((Vn, N, 2))
    msk = np.zeros((Vn, N), bool)
    for k, (o, i) in enumerate(views):
        n = len(o)
        obj[k, :n] = o
        img[k, :n] = i
        msk[k, :n] = True

    theta, rms = _refine(np.array([fx, fy, cx, cy]), rvecs, tvecs,
                         obj, img, msk, refine_iters)
    fx, fy, cx, cy = theta[:4]
    dist = theta[4:8]
    rv = theta[8:8 + 3 * Vn].reshape(Vn, 3)
    tv = theta[8 + 3 * Vn:].reshape(Vn, 3)
    return CalibrationResult(float(fx), float(fy), float(cx), float(cy),
                             np.asarray(dist), float(rms), rv, tv)


def _refine(k4, rvecs, tvecs, obj, img, msk, iters):
    """Batched Gauss-Newton over (fx fy cx cy k1 k2 p1 p2, poses)."""
    import jax
    import jax.numpy as jnp

    from dynamic_vins_tpu.geometry import camera as cam
    from dynamic_vins_tpu.geometry import lie

    Vn = rvecs.shape[0]
    theta0 = jnp.asarray(np.concatenate(
        [k4, np.zeros(4), rvecs.reshape(-1), tvecs.reshape(-1)]))
    obj = jnp.asarray(obj)
    img = jnp.asarray(img)
    mskf = jnp.asarray(msk, theta0.dtype)

    def residuals(theta):
        intr = cam.PinholeIntrinsics.make(
            theta[0], theta[1], theta[2], theta[3], theta[4], theta[5],
            theta[6], theta[7], dtype=theta.dtype)
        rv = theta[8:8 + 3 * Vn].reshape(Vn, 3)
        tv = theta[8 + 3 * Vn:].reshape(Vn, 3)

        def one(rv_k, tv_k, obj_k, img_k, m_k):
            q = lie.so3_exp_quat(rv_k)
            p3 = jnp.concatenate(
                [obj_k, jnp.zeros_like(obj_k[:, :1])], axis=1)
            pc = lie.quat_rotate(q[None, :], p3) + tv_k[None, :]
            uv = cam.project(intr, pc)
            return (uv - img_k) * m_k[:, None]

        r = jax.vmap(one)(rv, tv, obj, img, mskf)
        return r.reshape(-1)

    @jax.jit
    def gn_step(theta):
        J = jax.jacfwd(residuals)(theta)
        r = residuals(theta)
        H = J.T @ J + 1e-9 * jnp.eye(theta.shape[0], dtype=theta.dtype)
        g = J.T @ r
        return theta - jnp.linalg.solve(H, g)

    theta = theta0
    for _ in range(iters):
        theta = gn_step(theta)
    r = residuals(theta)
    n_obs = float(np.asarray(mskf).sum())
    rms = float(np.sqrt(np.asarray(r @ r) / max(2 * n_obs, 1.0) * 2.0))
    return np.asarray(theta), rms
