"""Image pyramids and image-processing primitives (pure JAX/XLA).

Replaces the OpenCV(-CUDA) image ops the reference frontend relies on
(`front_end/feature_utils.cpp`, `background_tracker.cpp:30-43`):
Gaussian pyramid construction, gradients, bilinear sampling, and
morphological erosion for mask gating. All ops are convolution/gather
based so XLA fuses and tiles them for the VPU/MXU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _gauss_kernel5(dtype):
    k = jnp.asarray([1.0, 4.0, 6.0, 4.0, 1.0], dtype=dtype) / 16.0
    return k


def gaussian_blur5(img):
    """Separable 5-tap Gaussian blur, reflect padding. img: [H,W]."""
    k = _gauss_kernel5(img.dtype)
    pad = jnp.pad(img, ((2, 2), (0, 0)), mode="edge")
    img = sum(k[i] * pad[i:i + img.shape[0], :] for i in range(5))
    pad = jnp.pad(img, ((0, 0), (2, 2)), mode="edge")
    img = sum(k[i] * pad[:, i:i + img.shape[1]] for i in range(5))
    return img


def pyr_down(img):
    """Blur + 2x decimation (cv::pyrDown semantics)."""
    return gaussian_blur5(img)[::2, ::2]


def build_pyramid(img, levels: int):
    """List of [H/2^l, W/2^l] images, level 0 = input."""
    pyr = [img]
    for _ in range(levels - 1):
        pyr.append(pyr_down(pyr[-1]))
    return pyr


def scharr_gradients(img):
    """Scharr x/y gradients (the 3x3 kernel OpenCV uses for LK)."""
    p = jnp.pad(img, 1, mode="edge")
    h, w = img.shape
    # separable scharr: smooth [3,10,3]/16, diff [-1,0,1]/2  (âˆ‚x)
    sm = jnp.asarray([3.0, 10.0, 3.0], dtype=img.dtype) / 16.0
    df = jnp.asarray([-1.0, 0.0, 1.0], dtype=img.dtype) / 2.0

    def sep(pimg, kr, kc):
        t = sum(kr[i] * pimg[i:i + h, :] for i in range(3))
        return sum(kc[j] * t[:, j:j + w] for j in range(3))

    ix = sep(p, sm, df)
    iy = sep(p, df, sm)
    return ix, iy


def bilinear_sample(img, xy):
    """Sample img [H,W] at float coords xy [...,2] (x, y order).

    Out-of-bounds clamps to the border (callers mask separately)."""
    H, W = img.shape
    x = jnp.clip(xy[..., 0], 0.0, W - 1.001)
    y = jnp.clip(xy[..., 1], 0.0, H - 1.001)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = (x - x0).astype(img.dtype)
    fy = (y - y0).astype(img.dtype)
    x1 = jnp.minimum(x0 + 1, W - 1)
    y1 = jnp.minimum(y0 + 1, H - 1)
    v00 = img[y0, x0]
    v01 = img[y0, x1]
    v10 = img[y1, x0]
    v11 = img[y1, x1]
    return ((1 - fy) * ((1 - fx) * v00 + fx * v01)
            + fy * ((1 - fx) * v10 + fx * v11))


def sample_patch(img, center_xy, radius: int):
    """Bilinear patch [...,(2r+1),(2r+1)] around float centers [...,2]."""
    d = jnp.arange(-radius, radius + 1, dtype=img.dtype)
    dy, dx = jnp.meshgrid(d, d, indexing="ij")
    offs = jnp.stack([dx, dy], axis=-1)            # [P,P,2]
    coords = center_xy[..., None, None, :] + offs
    return bilinear_sample(img, coords)


def erode3(mask, iterations: int = 1):
    """3x3 binary erosion (ErodeMaskGpu parity, feature_utils.cpp)."""
    m = mask.astype(jnp.float32)
    for _ in range(iterations):
        p = jnp.pad(m, 1, mode="constant", constant_values=1.0)
        h, w = m.shape
        m = jnp.min(jnp.stack([p[i:i + h, j:j + w]
                               for i in range(3) for j in range(3)]),
                    axis=0)
    return m > 0.5


def dilate3(mask, iterations: int = 1):
    m = mask.astype(jnp.float32)
    for _ in range(iterations):
        p = jnp.pad(m, 1, mode="constant", constant_values=0.0)
        h, w = m.shape
        m = jnp.max(jnp.stack([p[i:i + h, j:j + w]
                               for i in range(3) for j in range(3)]),
                    axis=0)
    return m > 0.5
