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
