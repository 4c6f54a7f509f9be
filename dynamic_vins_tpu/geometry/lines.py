"""3D line geometry: Plücker coordinates and orthonormal representation.

Capability parity with `line_detector/line_geometry.{h,cpp}`
(plk_to_orth/orth_to_plk `line_geometry.h:27-28`, plane-plane init
`pipi_plk:31`, line transforms, reprojection error `:44`), rebuilt as
batched jit-safe functions.

A 3D line is (n, d): n = normal of the plane through the line and the
origin (n = p x d for a point p on the line), d = direction. The
orthonormal parameterization is 4-dof: (psi [3] — SO(3) log of the
[n/|n|, d/|d|, n x d/|nd|] frame, phi — atan2(|d|, |n|) encoding the
distance).
"""

from __future__ import annotations

import jax.numpy as jnp

from dynamic_vins_tpu.geometry import lie
from dynamic_vins_tpu.geometry.lie import hat


def plucker_from_two_points(p1, p2):
    """Line through two 3D points -> (n [.,3], d [.,3])."""
    d = p2 - p1
    n = jnp.cross(p1, p2)
    return n, d


def plucker_from_two_planes(pi1, pi2):
    """Line = intersection of two planes pi = (a,b,c,e) (pipi_plk)."""
    n1, e1 = pi1[..., :3], pi1[..., 3:4]
    n2, e2 = pi2[..., :3], pi2[..., 3:4]
    d = jnp.cross(n1, n2)
    n = e2 * n1 - e1 * n2
    return n, d


def plane_from_point_line(p, s, e):
    """Plane through 3 points (p, s, e) as (a,b,c,e)."""
    n = jnp.cross(s - p, e - p)
    w = -jnp.sum(n * p, axis=-1, keepdims=True)
    return jnp.concatenate([n, w], axis=-1)


def plucker_to_orth(n, d):
    """(n, d) -> orth [.,4] (plk_to_orth)."""
    nn = jnp.linalg.norm(n, axis=-1, keepdims=True)
    nd = jnp.linalg.norm(d, axis=-1, keepdims=True)
    u1 = n / jnp.maximum(nn, 1e-12)
    u2 = d / jnp.maximum(nd, 1e-12)
    u3 = jnp.cross(u1, u2)
    R = jnp.stack([u1, u2, u3], axis=-1)   # columns
    psi = lie.so3_log(R)
    phi = jnp.arctan2(nd[..., 0], nn[..., 0])
    return jnp.concatenate([psi, phi[..., None]], axis=-1)


def orth_to_plucker(orth):
    """orth [.,4] -> (n, d) with |n|=cos(phi), |d|=sin(phi) scaling.

    Note: overall Plücker scale is gauge; (n, d) returned with
    n = w1 * u1, d = w2 * u2, (w1, w2) = (cos phi, sin phi)."""
    psi = orth[..., :3]
    phi = orth[..., 3]
    R = lie.so3_exp(psi)
    u1 = R[..., :, 0]
    u2 = R[..., :, 1]
    w1 = jnp.cos(phi)[..., None]
    w2 = jnp.sin(phi)[..., None]
    return w1 * u1, w2 * u2


def orth_boxplus(orth, delta):
    """4-dof orthonormal update (LineOrthParameterization semantics):
    rotate the U frame by delta[:3], advance phi by delta[3]."""
    psi = orth[..., :3]
    phi = orth[..., 3]
    R = lie.so3_exp(psi)
    R_new = R @ lie.so3_exp(delta[..., :3])
    psi_new = lie.so3_log(R_new)
    return jnp.concatenate([psi_new, (phi + delta[..., 3])[..., None]],
                           axis=-1)


def transform_line(n, d, p_ab, q_ab):
    """Transform a line from frame b to frame a given T_ab=(p,q):
    n_a = R n_b + [p]x R d_b ; d_a = R d_b."""
    R = lie.quat_to_matrix(q_ab)
    d_a = (R @ d[..., None])[..., 0]
    n_a = (R @ n[..., None])[..., 0] + jnp.cross(p_ab, d_a)
    return n_a, d_a


def project_line(n_c):
    """Camera-frame Plücker -> normalized image line l=(l1,l2,l3).

    In normalized coordinates the image line is just n_c (the plane
    normal through the camera center)."""
    return n_c


def line_point_distance(l, pt):
    """Signed distance of normalized image point [.,3] to line l [.,3]
    (LineReprojectionError semantics: normalize by sqrt(l1^2+l2^2))."""
    denom = jnp.sqrt(l[..., 0] ** 2 + l[..., 1] ** 2)
    return jnp.sum(l * pt, axis=-1) / jnp.maximum(denom, 1e-12)


def triangulate_line_two_view(p_cw0, q_cw0, p_cw1, q_cw1,
                              s0, e0, s1, e1):
    """Init a world line from endpoint obs in two views
    (`TriangulateOneLine` vio_util.cpp:447 semantics, via two planes).

    (p_cw,q_cw): world->camera. s/e: normalized endpoints [.,3], z=1.
    Returns world (n, d)."""
    # camera centers / rays in world
    p_wc0, q_wc0 = lie.pose_inverse(p_cw0, q_cw0)
    p_wc1, q_wc1 = lie.pose_inverse(p_cw1, q_cw1)
    c0 = p_wc0
    c1 = p_wc1
    s0_w = lie.pose_transform_point(p_wc0, q_wc0, s0)
    e0_w = lie.pose_transform_point(p_wc0, q_wc0, e0)
    s1_w = lie.pose_transform_point(p_wc1, q_wc1, s1)
    e1_w = lie.pose_transform_point(p_wc1, q_wc1, e1)
    pi0 = plane_from_point_line(c0, s0_w, e0_w)
    pi1 = plane_from_point_line(c1, s1_w, e1_w)
    return plucker_from_two_planes(pi0, pi1)


def triangulate_line_multiview(p_cw, q_cw, s_obs, e_obs, valid):
    """Robust multi-view line fit (all observations at once).

    p_cw/q_cw: [K,3]/[K,4] world->camera transforms; s_obs/e_obs: [K,3]
    normalized endpoints; valid: [K]. Each view constrains the world
    Plücker line (n,d) by: the projected line n_c must be parallel to
    the observed image line l_obs = s x e, i.e. [l_obs]x n_c = 0 with
    n_c = R n + [p]x R d — two independent linear rows per view.
    Formulation: each view back-projects its observed image line to a
    WORLD plane through the camera center with normal m_k = R_cwᵀ l_obs.
    The 3D line lies in every such plane, so:
      (a) direction: d ⟂ m_k for all k  -> d = smallest right singular
          vector of the stacked normals M [K,3];
      (b) point: p0 with m_kᵀ p0 = m_kᵀ c_k, solved in the 2-dof plane
          p0 ⟂ d (kills the translation-along-line gauge).
    (A naive homogeneous SVD over (n,d) admits the degenerate family of
    lines through the camera centers, which project to n_c = 0 — this
    formulation has no trivial solutions.)
    Returns (n_w [3], d_w [3], residual_ratio)."""
    R = lie.quat_to_matrix(q_cw)                    # [K,3,3] world->cam
    l_obs = jnp.cross(s_obs, e_obs)
    l_obs = l_obs / jnp.maximum(
        jnp.linalg.norm(l_obs, axis=-1, keepdims=True), 1e-12)
    # world-frame viewing-plane normals and camera centers
    m = jnp.einsum("kij,ki->kj", R, l_obs)          # Rᵀ l
    m = m * valid[:, None]
    centers = -jnp.einsum("kij,ki->kj", R, p_cw)    # c = -Rᵀ p_cw

    # direction: nullspace of M
    _, sv, vt = jnp.linalg.svd(m, full_matrices=False)
    d = vt[-1]
    ratio = sv[-1] / jnp.maximum(sv[0], 1e-12)

    # point: LS in the plane orthogonal to d
    tmp = jnp.where(jnp.abs(d[2]) < 0.9,
                    jnp.array([0.0, 0.0, 1.0], d.dtype),
                    jnp.array([1.0, 0.0, 0.0], d.dtype))
    b1 = jnp.cross(d, tmp)
    b1 = b1 / jnp.maximum(jnp.linalg.norm(b1), 1e-12)
    b2 = jnp.cross(d, b1)
    B = jnp.stack([b1, b2], axis=1)                 # [3,2]
    A2 = m @ B                                      # [K,2]
    rhs = jnp.sum(m * centers, axis=-1)             # [K]
    AtA = A2.T @ A2 + 1e-12 * jnp.eye(2, dtype=d.dtype)
    y = jnp.linalg.solve(AtA, A2.T @ rhs)
    p0 = B @ y
    n = jnp.cross(p0, d)
    return n, d, ratio


def endpoint_trim(n_w, d_w, p_cw, q_cw, s_obs, e_obs):
    """Closest points on the infinite line to the observed endpoint
    rays; used for line-length bookkeeping and visualization."""
    # point on line closest to origin (world): p0 = d x n / |d|^2
    cross = jnp.cross(d_w, n_w)
    d2 = jnp.sum(d_w * d_w, axis=-1, keepdims=True)
    p0 = cross / jnp.maximum(d2, 1e-12)
    return p0
