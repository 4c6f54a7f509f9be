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


def endpoint_trim(n_w, d_w, p_cw, q_cw, s_obs, e_obs):
    """Closest points on the infinite line to the observed endpoint
    rays; used for line-length bookkeeping and visualization."""
    # point on line closest to origin (world): p0 = d x n / |d|^2
    cross = jnp.cross(d_w, n_w)
    d2 = jnp.sum(d_w * d_w, axis=-1, keepdims=True)
    p0 = cross / jnp.maximum(d2, 1e-12)
    return p0
