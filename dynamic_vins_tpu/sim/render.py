"""Render synthetic camera images of the simulated landmark world.

Gives the full pipeline (images -> LK tracker -> estimator) a closed
testing loop without datasets on disk: landmarks are splatted as
Gaussian blobs whose image motion is exactly consistent with the
ground-truth trajectory.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from dynamic_vins_tpu.geometry import lie
from dynamic_vins_tpu.geometry.camera import PinholeIntrinsics, project
from dynamic_vins_tpu.sim.synthetic import StereoRig, observe


def small_rig(scale: float = 0.5, dtype=jnp.float64) -> StereoRig:
    """Reduced-resolution rig for fast image-domain tests."""
    base = StereoRig.default(dtype=dtype)
    intr = PinholeIntrinsics.make(
        float(base.intr.fx) * scale, float(base.intr.fy) * scale,
        float(base.intr.cx) * scale, float(base.intr.cy) * scale,
        dtype=dtype)
    return base._replace(intr=intr, width=int(752 * scale),
                         height=int(480 * scale))


def render_frame(rig: StereoRig, p_wb, q_wb, landmarks, intensities,
                 cam: int = 0, sigma: float = 1.6):
    """Render one [H,W] float image with Gaussian splats."""
    uv, vis, ptc = observe(rig, p_wb, q_wb, landmarks, cam=cam)
    H, W = rig.height, rig.width
    yy, xx = jnp.meshgrid(jnp.arange(H, dtype=uv.dtype),
                          jnp.arange(W, dtype=uv.dtype), indexing="ij")

    def splat(img, args):
        u, v, visible, inten = args
        d2 = (xx - u) ** 2 + (yy - v) ** 2
        blob = inten * jnp.exp(-d2 / (2.0 * sigma * sigma))
        return img + jnp.where(visible, blob, 0.0), None

    img0 = jnp.zeros((H, W), uv.dtype)
    img, _ = jax.lax.scan(
        splat, img0, (uv[:, 0], uv[:, 1], vis, intensities))
    return jnp.clip(img, 0.0, 255.0)


def make_intensities(n: int, seed: int = 0):
    import numpy as np

    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.uniform(120.0, 255.0, size=n))


def render_depth(rig: StereoRig, p_wb, q_wb, landmarks, cam: int = 0,
                 radius: float = 3.0):
    """Depth image consistent with `render_frame`'s splats: each pixel
    takes the nearest landmark depth whose splat center lies within
    `radius` px (inf where no landmark renders). Stands in for the
    stereo/LEAStereo depth source in loop-closure tests."""
    uv, vis, ptc = observe(rig, p_wb, q_wb, landmarks, cam=cam)
    H, W = rig.height, rig.width
    yy, xx = jnp.meshgrid(jnp.arange(H, dtype=uv.dtype),
                          jnp.arange(W, dtype=uv.dtype), indexing="ij")

    def splat(depth, args):
        u, v, visible, z = args
        d2 = (xx - u) ** 2 + (yy - v) ** 2
        cand = jnp.where(visible & (d2 <= radius * radius), z, jnp.inf)
        return jnp.minimum(depth, cand), None

    depth0 = jnp.full((H, W), jnp.inf, uv.dtype)
    depth, _ = jax.lax.scan(
        splat, depth0, (uv[:, 0], uv[:, 1], vis, ptc[:, 2]))
    return depth
