"""Pinhole camera model (radial-tangential distortion), JAX-native.

Capability parity with the reference's camodocal PinholeCamera
(`camera_models/src/camera_models/PinholeCamera.cc`): `spaceToPlane`
(project) and `liftProjective` (unproject with iterative undistortion).
Rebuilt as batched, jit-safe functions with fixed iteration counts.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class PinholeIntrinsics(NamedTuple):
    """fx, fy, cx, cy, k1, k2, p1, p2 as a flat parameter array [...,8]."""

    fx: jnp.ndarray
    fy: jnp.ndarray
    cx: jnp.ndarray
    cy: jnp.ndarray
    k1: jnp.ndarray
    k2: jnp.ndarray
    p1: jnp.ndarray
    p2: jnp.ndarray

    @classmethod
    def make(cls, fx, fy, cx, cy, k1=0.0, k2=0.0, p1=0.0, p2=0.0,
             dtype=jnp.float32):
        vals = [jnp.asarray(v, dtype=dtype)
                for v in (fx, fy, cx, cy, k1, k2, p1, p2)]
        return cls(*vals)

    @property
    def has_distortion(self):
        return bool(
            jnp.any(jnp.abs(jnp.stack([self.k1, self.k2, self.p1, self.p2]))
                    > 0.0))


def distort(intr: PinholeIntrinsics, xy):
    """Apply radial-tangential distortion to normalized coords [...,2].

    Returns the *additive* distortion term d_u such that
    distorted = xy + d_u  (camodocal PinholeCamera::distortion).
    """
    x, y = xy[..., 0], xy[..., 1]
    x2, y2, xy_ = x * x, y * y, x * y
    rho2 = x2 + y2
    rad = intr.k1 * rho2 + intr.k2 * rho2 * rho2
    dx = x * rad + 2.0 * intr.p1 * xy_ + intr.p2 * (rho2 + 2.0 * x2)
    dy = y * rad + 2.0 * intr.p2 * xy_ + intr.p1 * (rho2 + 2.0 * y2)
    return jnp.stack([dx, dy], axis=-1)


def project(intr: PinholeIntrinsics, pts_cam):
    """3D camera-frame points [...,3] -> pixel coords [...,2] (spaceToPlane)."""
    z = pts_cam[..., 2:3]
    xy = pts_cam[..., :2] / jnp.where(jnp.abs(z) < 1e-9,
                                      jnp.sign(z) * 1e-9 + 1e-12, z)
    xy_d = xy + distort(intr, xy)
    u = intr.fx * xy_d[..., 0] + intr.cx
    v = intr.fy * xy_d[..., 1] + intr.cy
    return jnp.stack([u, v], axis=-1)


def lift(intr: PinholeIntrinsics, uv, num_iters: int = 8):
    """Pixel coords [...,2] -> normalized ray [...,3] (liftProjective).

    Undistortion by fixed-point iteration (the reference's recursive
    distortion model, PinholeCamera.cc:490-510), fixed `num_iters` so the
    loop is jit-static.
    """
    mx_d = (uv[..., 0] - intr.cx) / intr.fx
    my_d = (uv[..., 1] - intr.cy) / intr.fy
    pd = jnp.stack([mx_d, my_d], axis=-1)
    pu = pd
    for _ in range(num_iters):
        pu = pd - distort(intr, pu)
    ones = jnp.ones_like(pu[..., :1])
    return jnp.concatenate([pu, ones], axis=-1)


def normalized_from_pixel(intr: PinholeIntrinsics, uv, num_iters: int = 8):
    """Pixel -> undistorted normalized image coords [...,2]."""
    return lift(intr, uv, num_iters)[..., :2]


def pixel_from_normalized(intr: PinholeIntrinsics, xy):
    """Undistorted normalized coords -> pixel coords (with distortion)."""
    xy_d = xy + distort(intr, xy)
    u = intr.fx * xy_d[..., 0] + intr.cx
    v = intr.fy * xy_d[..., 1] + intr.cy
    return jnp.stack([u, v], axis=-1)


# ---------------------------------------------------------------------------
# Equidistant (Kannala-Brandt) fisheye model — camodocal
# EquidistantCamera parity (camera_models/src/.../EquidistantCamera.cc):
# r(theta) = k... theta + k2 theta^3 + k3 theta^5 + k4 theta^7 + k5 theta^9
# ---------------------------------------------------------------------------

class EquidistantIntrinsics(NamedTuple):
    fx: jnp.ndarray
    fy: jnp.ndarray
    cx: jnp.ndarray
    cy: jnp.ndarray
    k2: jnp.ndarray
    k3: jnp.ndarray
    k4: jnp.ndarray
    k5: jnp.ndarray

    @classmethod
    def make(cls, fx, fy, cx, cy, k2=0.0, k3=0.0, k4=0.0, k5=0.0,
             dtype=jnp.float32):
        return cls(*[jnp.asarray(v, dtype=dtype)
                     for v in (fx, fy, cx, cy, k2, k3, k4, k5)])


def _kb_r(intr: EquidistantIntrinsics, theta):
    t2 = theta * theta
    return theta * (1.0 + t2 * (intr.k2 + t2 * (intr.k3 + t2 * (
        intr.k4 + t2 * intr.k5))))


def equidistant_project(intr: EquidistantIntrinsics, pts_cam):
    """3D camera points [...,3] -> pixels (spaceToPlane)."""
    x, y, z = pts_cam[..., 0], pts_cam[..., 1], pts_cam[..., 2]
    rho = jnp.sqrt(x * x + y * y)
    theta = jnp.arctan2(rho, z)
    r = _kb_r(intr, theta)
    scale = r / jnp.maximum(rho, 1e-12)
    u = intr.fx * scale * x + intr.cx
    v = intr.fy * scale * y + intr.cy
    return jnp.stack([u, v], axis=-1)


def equidistant_lift(intr: EquidistantIntrinsics, uv,
                     num_iters: int = 10):
    """Pixels -> unit-norm rays (liftProjective): invert r(theta) by
    fixed-count Newton iterations (jit-static)."""
    mx = (uv[..., 0] - intr.cx) / intr.fx
    my = (uv[..., 1] - intr.cy) / intr.fy
    r_d = jnp.sqrt(mx * mx + my * my)
    theta = r_d
    for _ in range(num_iters):
        t2 = theta * theta
        f = _kb_r(intr, theta) - r_d
        df = 1.0 + t2 * (3 * intr.k2 + t2 * (5 * intr.k3 + t2 * (
            7 * intr.k4 + t2 * 9 * intr.k5)))
        theta = theta - f / jnp.maximum(df, 1e-9)
    s = jnp.sin(theta) / jnp.maximum(r_d, 1e-12)
    ray = jnp.stack([s * mx, s * my, jnp.cos(theta)], axis=-1)
    return ray


# ---------------------------------------------------------------------------
# MEI (unified catadioptric) model — camodocal CataCamera parity
# (camera_models/src/camera_models/CataCamera.cc): unit-sphere projection
# with mirror parameter xi + radial-tangential distortion.
# ---------------------------------------------------------------------------

class CataIntrinsics(NamedTuple):
    xi: jnp.ndarray
    k1: jnp.ndarray
    k2: jnp.ndarray
    p1: jnp.ndarray
    p2: jnp.ndarray
    gamma1: jnp.ndarray
    gamma2: jnp.ndarray
    u0: jnp.ndarray
    v0: jnp.ndarray

    @classmethod
    def make(cls, xi, gamma1, gamma2, u0, v0, k1=0.0, k2=0.0, p1=0.0,
             p2=0.0, dtype=jnp.float32):
        return cls(*[jnp.asarray(v, dtype=dtype)
                     for v in (xi, k1, k2, p1, p2, gamma1, gamma2,
                               u0, v0)])

    def _pinhole_dist(self):
        """Reuse the rad-tan distortion helper on (k1,k2,p1,p2)."""
        return PinholeIntrinsics(self.gamma1, self.gamma2, self.u0,
                                 self.v0, self.k1, self.k2, self.p1,
                                 self.p2)


def cata_project(intr: CataIntrinsics, pts_cam):
    """3D camera points [...,3] -> pixels (CataCamera::spaceToPlane)."""
    norm = jnp.linalg.norm(pts_cam, axis=-1)
    zs = pts_cam[..., 2] + intr.xi * norm
    m = pts_cam[..., :2] / jnp.maximum(zs, 1e-9)[..., None]
    m_d = m + distort(intr._pinhole_dist(), m)
    u = intr.gamma1 * m_d[..., 0] + intr.u0
    v = intr.gamma2 * m_d[..., 1] + intr.v0
    return jnp.stack([u, v], axis=-1)


def cata_lift(intr: CataIntrinsics, uv, num_iters: int = 8):
    """Pixels -> rays (CataCamera::liftProjective): fixed-point
    undistortion, then closed-form lift off the unit sphere
    (CataCamera.cc lambda formula)."""
    mx_d = (uv[..., 0] - intr.u0) / intr.gamma1
    my_d = (uv[..., 1] - intr.v0) / intr.gamma2
    pd = jnp.stack([mx_d, my_d], axis=-1)
    pu = pd
    dist = intr._pinhole_dist()
    for _ in range(num_iters):
        pu = pd - distort(dist, pu)
    rho2 = jnp.sum(pu * pu, axis=-1)
    xi = intr.xi
    lam = (xi + jnp.sqrt(1.0 + (1.0 - xi * xi) * rho2)) / (1.0 + rho2)
    ray = jnp.concatenate([lam[..., None] * pu,
                           (lam - xi)[..., None]], axis=-1)
    return ray / jnp.maximum(
        jnp.linalg.norm(ray, axis=-1, keepdims=True), 1e-12)


# ---------------------------------------------------------------------------
# Scaramuzza (OCamCalib) omnidirectional model — camodocal
# ScaramuzzaCamera parity (camera_models/src/.../ScaramuzzaCamera.cc):
# cam2world polynomial in the image radius, world2cam inverse polynomial
# in the incidence angle, plus a 2x2 affine (c,d,e) + center.
# ---------------------------------------------------------------------------

SCARAMUZZA_POLY_SIZE = 5
SCARAMUZZA_INV_POLY_SIZE = 12


class ScaramuzzaIntrinsics(NamedTuple):
    poly: jnp.ndarray        # [5]  cam2world: z = sum_i poly[i] rho^i
    inv_poly: jnp.ndarray    # [12] world2cam: rho = sum_i ip[i] theta^i
    c: jnp.ndarray
    d: jnp.ndarray
    e: jnp.ndarray
    center_x: jnp.ndarray
    center_y: jnp.ndarray

    @classmethod
    def make(cls, poly, inv_poly, center_x, center_y, c=1.0, d=0.0,
             e=0.0, dtype=jnp.float32):
        poly = jnp.zeros(SCARAMUZZA_POLY_SIZE, dtype).at[
            :len(poly)].set(jnp.asarray(poly, dtype))
        inv_poly = jnp.zeros(SCARAMUZZA_INV_POLY_SIZE, dtype).at[
            :len(inv_poly)].set(jnp.asarray(inv_poly, dtype))
        return cls(poly, inv_poly,
                   *[jnp.asarray(v, dtype=dtype)
                     for v in (c, d, e, center_x, center_y)])


def _polyval(coeffs, x):
    """sum_i coeffs[i] * x^i with static coefficient count."""
    out = jnp.zeros_like(x)
    for i in range(coeffs.shape[0] - 1, -1, -1):
        out = out * x + coeffs[i]
    return out


def scaramuzza_lift(intr: ScaramuzzaIntrinsics, uv):
    """Pixels -> unit rays (ScaramuzzaCamera::liftProjective).

    Convention: the OCamCalib polynomial gives z' = poly(rho) in a
    frame whose optical axis points along -z; camodocal flips it so the
    returned ray has z>0 forward."""
    du = uv[..., 0] - intr.center_x
    dv = uv[..., 1] - intr.center_y
    inv_det = 1.0 / (intr.c - intr.d * intr.e)
    xp = inv_det * (du - intr.d * dv)
    yp = inv_det * (-intr.e * du + intr.c * dv)
    rho = jnp.sqrt(xp * xp + yp * yp)
    zp = -_polyval(intr.poly, rho)
    ray = jnp.stack([xp, yp, zp], axis=-1)
    return ray / jnp.maximum(
        jnp.linalg.norm(ray, axis=-1, keepdims=True), 1e-12)


def scaramuzza_project(intr: ScaramuzzaIntrinsics, pts_cam):
    """3D camera points -> pixels (ScaramuzzaCamera::spaceToPlane)."""
    x, y, z = pts_cam[..., 0], pts_cam[..., 1], pts_cam[..., 2]
    norm_xy = jnp.sqrt(x * x + y * y)
    theta = jnp.arctan2(-z, jnp.maximum(norm_xy, 1e-12))
    rho = _polyval(intr.inv_poly, theta)
    inv_n = 1.0 / jnp.maximum(norm_xy, 1e-12)
    xn = x * inv_n * rho
    yn = y * inv_n * rho
    u = xn * intr.c + yn * intr.d + intr.center_x
    v = xn * intr.e + yn + intr.center_y
    return jnp.stack([u, v], axis=-1)


def scaramuzza_fit_inverse(poly, max_rho: float, n: int = 256):
    """Fit the world2cam inverse polynomial from the cam2world one by
    dense sampling + least squares (the OCamCalib `findinvpoly`
    procedure the reference's calibrations were produced with)."""
    import numpy as _np

    rho = _np.linspace(1e-3, max_rho, n)
    z = -_np.polyval(_np.asarray(poly)[::-1], rho)
    theta = _np.arctan2(-z, rho)
    A = _np.stack([theta ** i
                   for i in range(SCARAMUZZA_INV_POLY_SIZE)], axis=-1)
    coef, *_ = _np.linalg.lstsq(A, rho, rcond=None)
    return coef
