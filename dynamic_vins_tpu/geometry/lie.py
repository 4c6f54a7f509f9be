"""Lie-group math for the TPU-native dynamic VIO engine.

Quaternion convention: Hamilton, stored as [w, x, y, z] (scalar first).
Rotations act as R(q) v = q * v * q^-1 (body -> world when q = q_wb).

All functions are shape-polymorphic over leading batch dimensions and are
written to be `jit`/`vmap`/`grad`-safe (no data-dependent Python control
flow; small-angle branches use `jnp.where` with Taylor fallbacks).

Capability parity notes (reference, for behaviour only — not a port):
  - quaternion boxplus mirrors dynamic_vins
    `estimator/factor/pose_local_parameterization.cpp` (Plus = p+dp, q*dq).
  - `Utility::deltaQ`-style small-angle quaternion in `quat_from_small_angle`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


# ---------------------------------------------------------------------------
# Quaternion primitives ([w, x, y, z])
# ---------------------------------------------------------------------------

def quat_identity(dtype=jnp.float32):
    return jnp.array([1.0, 0.0, 0.0, 0.0], dtype=dtype)


def quat_normalize(q):
    n = jnp.linalg.norm(q, axis=-1, keepdims=True)
    return q / jnp.maximum(n, _EPS)


def quat_conjugate(q):
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_multiply(q1, q2):
    """Hamilton product q1 ⊗ q2."""
    w1, x1, y1, z1 = jnp.moveaxis(q1, -1, 0)
    w2, x2, y2, z2 = jnp.moveaxis(q2, -1, 0)
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


def quat_rotate(q, v):
    """Rotate vector(s) v by quaternion(s) q: R(q) @ v."""
    w = q[..., :1]
    xyz = q[..., 1:]
    t = 2.0 * jnp.cross(xyz, v)
    return v + w * t + jnp.cross(xyz, t)


def quat_to_matrix(q):
    w, x, y, z = jnp.moveaxis(q, -1, 0)
    tx, ty, tz = 2.0 * x, 2.0 * y, 2.0 * z
    twx, twy, twz = tx * w, ty * w, tz * w
    txx, txy, txz = tx * x, ty * x, tz * x
    tyy, tyz, tzz = ty * y, tz * y, tz * z
    r = jnp.stack(
        [
            1.0 - (tyy + tzz), txy - twz, txz + twy,
            txy + twz, 1.0 - (txx + tzz), tyz - twx,
            txz - twy, tyz + twx, 1.0 - (txx + tyy),
        ],
        axis=-1,
    )
    return r.reshape(q.shape[:-1] + (3, 3))


def matrix_to_quat(R):
    """Rotation matrix -> quaternion [w,x,y,z], branch-free (Shepperd)."""
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    # Four candidate constructions; pick the numerically best via where.
    qw0 = jnp.sqrt(jnp.maximum(1.0 + tr, _EPS)) * 0.5
    q0 = jnp.stack(
        [qw0, (m21 - m12) / (4.0 * qw0), (m02 - m20) / (4.0 * qw0),
         (m10 - m01) / (4.0 * qw0)], axis=-1)

    qx1 = jnp.sqrt(jnp.maximum(1.0 + m00 - m11 - m22, _EPS)) * 0.5
    q1 = jnp.stack(
        [(m21 - m12) / (4.0 * qx1), qx1, (m01 + m10) / (4.0 * qx1),
         (m02 + m20) / (4.0 * qx1)], axis=-1)

    qy2 = jnp.sqrt(jnp.maximum(1.0 - m00 + m11 - m22, _EPS)) * 0.5
    q2 = jnp.stack(
        [(m02 - m20) / (4.0 * qy2), (m01 + m10) / (4.0 * qy2), qy2,
         (m12 + m21) / (4.0 * qy2)], axis=-1)

    qz3 = jnp.sqrt(jnp.maximum(1.0 - m00 - m11 + m22, _EPS)) * 0.5
    q3 = jnp.stack(
        [(m10 - m01) / (4.0 * qz3), (m02 + m20) / (4.0 * qz3),
         (m12 + m21) / (4.0 * qz3), qz3], axis=-1)

    cond0 = tr > 0.0
    cond1 = (m00 > m11) & (m00 > m22)
    cond2 = m11 > m22
    q = jnp.where(
        cond0[..., None], q0,
        jnp.where(cond1[..., None], q1, jnp.where(cond2[..., None], q2, q3)))
    # canonical sign: w >= 0
    return quat_normalize(q * jnp.where(q[..., :1] < 0.0, -1.0, 1.0))


def quat_from_small_angle(theta):
    """First-order quaternion for a small rotation vector (deltaQ)."""
    half = 0.5 * theta
    w = jnp.ones_like(theta[..., :1])
    return quat_normalize(jnp.concatenate([w, half], axis=-1))


# ---------------------------------------------------------------------------
# SO(3)
# ---------------------------------------------------------------------------

def hat(v):
    """so(3) hat operator: v -> skew-symmetric matrix."""
    x, y, z = jnp.moveaxis(v, -1, 0)
    zero = jnp.zeros_like(x)
    m = jnp.stack([zero, -z, y, z, zero, -x, -y, x, zero], axis=-1)
    return m.reshape(v.shape[:-1] + (3, 3))


def vee(M):
    return jnp.stack([M[..., 2, 1], M[..., 0, 2], M[..., 1, 0]], axis=-1)


def so3_exp_quat(theta):
    """Exponential map: rotation vector -> quaternion, small-angle safe."""
    angle2 = jnp.sum(theta * theta, axis=-1, keepdims=True)
    angle = jnp.sqrt(jnp.maximum(angle2, _EPS * _EPS))
    small = angle2 < 1e-12
    half = 0.5 * angle
    # sin(x/2)/x with Taylor fallback 1/2 - x^2/48
    k = jnp.where(small, 0.5 - angle2 / 48.0, jnp.sin(half) / angle)
    w = jnp.where(small, 1.0 - angle2 / 8.0, jnp.cos(half))
    return quat_normalize(jnp.concatenate([w, k * theta], axis=-1))


def so3_exp(theta):
    return quat_to_matrix(so3_exp_quat(theta))


def quat_log(q):
    """Logarithm map: quaternion -> rotation vector, small-angle safe."""
    q = quat_normalize(q)
    q = q * jnp.where(q[..., :1] < 0.0, -1.0, 1.0)  # shortest arc
    w = q[..., :1]
    xyz = q[..., 1:]
    n = jnp.linalg.norm(xyz, axis=-1, keepdims=True)
    n2 = n * n
    small = n2 < 1e-12
    wc = jnp.clip(w, -1.0, 1.0)
    angle = 2.0 * jnp.arctan2(n, wc)
    # theta = angle * xyz / n ; small-angle: 2*xyz/w * (1 - n^2/(3 w^2))
    k_small = 2.0 / jnp.maximum(wc, _EPS) * (1.0 - n2 / (3.0 * jnp.maximum(wc * wc, _EPS)))
    k = jnp.where(small, k_small, angle / jnp.maximum(n, _EPS))
    return k * xyz


def so3_log(R):
    return quat_log(matrix_to_quat(R))


def _taylor_coeffs(angle2):
    """(A, B, C) = sin x/x, (1-cos x)/x^2, (x - sin x)/x^3, small-safe."""
    angle = jnp.sqrt(jnp.maximum(angle2, _EPS * _EPS))
    small = angle2 < 1e-10
    A = jnp.where(small, 1.0 - angle2 / 6.0, jnp.sin(angle) / angle)
    B = jnp.where(small, 0.5 - angle2 / 24.0, (1.0 - jnp.cos(angle)) / angle2)
    C = jnp.where(small, 1.0 / 6.0 - angle2 / 120.0, (1.0 - A) / angle2)
    return A, B, C


def so3_left_jacobian(theta):
    """Jl(theta): exp((theta+d)^) ≈ exp(theta^) exp((Jr d)^), Jl = Jr^T."""
    angle2 = jnp.sum(theta * theta, axis=-1)[..., None, None]
    _, B, C = _taylor_coeffs(angle2)
    K = hat(theta)
    I = jnp.broadcast_to(jnp.eye(3, dtype=theta.dtype), K.shape)
    return I + B * K + C * (K @ K)


def so3_right_jacobian(theta):
    return jnp.swapaxes(so3_left_jacobian(theta), -1, -2)


def so3_left_jacobian_inv(theta):
    angle2 = jnp.sum(theta * theta, axis=-1)[..., None, None]
    angle = jnp.sqrt(jnp.maximum(angle2, _EPS * _EPS))
    small = angle2 < 1e-10
    half = 0.5 * angle
    cot_term = jnp.where(
        small,
        1.0 / 12.0 + angle2 / 720.0,
        (1.0 - half * jnp.cos(half) / jnp.maximum(jnp.sin(half), _EPS)) / angle2,
    )
    K = hat(theta)
    I = jnp.broadcast_to(jnp.eye(3, dtype=theta.dtype), K.shape)
    return I - 0.5 * K + cot_term * (K @ K)


def so3_right_jacobian_inv(theta):
    return jnp.swapaxes(so3_left_jacobian_inv(theta), -1, -2)


# ---------------------------------------------------------------------------
# SE(3) as (p: [...,3], q: [...,4])
# ---------------------------------------------------------------------------

def pose_identity(dtype=jnp.float32):
    return jnp.zeros((3,), dtype=dtype), quat_identity(dtype)


def pose_compose(p1, q1, p2, q2):
    """T1 * T2: first apply T2, then T1."""
    return p1 + quat_rotate(q1, p2), quat_multiply(q1, q2)


def pose_inverse(p, q):
    qi = quat_conjugate(q)
    return -quat_rotate(qi, p), qi


def pose_transform_point(p, q, x):
    return quat_rotate(q, x) + p


def pose_boxplus(p, q, dx):
    """Ceres PoseLocalParameterization::Plus — p += dp, q = q ⊗ dq(dtheta).

    dx: [..., 6] = [dp(3), dtheta(3)].
    """
    dp = dx[..., :3]
    dq = so3_exp_quat(dx[..., 3:6])
    return p + dp, quat_normalize(quat_multiply(q, dq))


def pose_boxminus(p1, q1, p0, q0):
    """Inverse of boxplus: dx with (p0,q0) ⊞ dx = (p1,q1)."""
    dtheta = quat_log(quat_multiply(quat_conjugate(q0), q1))
    return jnp.concatenate([p1 - p0, dtheta], axis=-1)


def yaw_from_quat(q):
    """Yaw (Z) of R(q) in ZYX Euler convention, radians."""
    R = quat_to_matrix(q)
    return jnp.arctan2(R[..., 1, 0], R[..., 0, 0])


def quat_from_yaw(yaw):
    half = 0.5 * yaw
    zero = jnp.zeros_like(half)
    return jnp.stack([jnp.cos(half), zero, zero, jnp.sin(half)], axis=-1)


def g2R(g):
    """Rotation aligning measured gravity direction to +Z (VINS Utility::g2R).

    Returns R0 with yaw removed such that R0 @ g ≈ [0,0,|g|].
    """
    ng1 = g / jnp.linalg.norm(g, axis=-1, keepdims=True)
    ng2 = jnp.asarray([0.0, 0.0, 1.0], dtype=g.dtype)
    axis = jnp.cross(ng1, ng2)
    s = jnp.linalg.norm(axis, axis=-1)
    c = jnp.sum(ng1 * ng2, axis=-1)
    angle = jnp.arctan2(s, c)
    axis = axis / jnp.maximum(s, _EPS)[..., None]
    R0 = so3_exp(axis * angle[..., None])
    q0 = matrix_to_quat(R0)
    yaw = yaw_from_quat(q0)
    Ryaw_inv = quat_to_matrix(quat_from_yaw(-yaw))
    return Ryaw_inv @ R0
