"""ORB feature extractor (oFAST + rBRIEF), TPU-native.

Capability parity with the reference's vendored ORB-SLAM2 extractor
(`dynamic_vins/src/utils/orb/ORBextractor.{h,cc}`, used by the
`orb_demo` experiment tool, CMakeLists.txt:166): image pyramid, FAST
corners with a per-cell grid distribution, intensity-centroid
orientation, and 256-bit steered-BRIEF descriptors.

TPU design: every stage is a fixed-shape array op under one jit —
FAST's 16-point circle test is a stack of rolls (vectorized over all
pixels), the grid distribution is a per-cell argmax (no quadtree
recursion), orientation/descriptor sampling use one gather each. The
BRIEF sampling pattern is generated once from a fixed PRNG.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

# FAST circle offsets (radius-3 Bresenham circle, OpenCV order)
_CIRCLE = np.array([
    (0, -3), (1, -3), (2, -2), (3, -1), (3, 0), (3, 1), (2, 2), (1, 3),
    (0, 3), (-1, 3), (-2, 2), (-3, 1), (-3, 0), (-3, -1), (-2, -2),
    (-1, -3)], np.int32)

_PATCH_R = 15          # orientation patch radius (ORBextractor HALF_PATCH_SIZE)


def _brief_pattern(n_bits: int = 256, seed: int = 7):
    """Gaussian test-pair pattern inside a 31x31 patch (rBRIEF)."""
    rng = np.random.RandomState(seed)
    pts = np.clip(rng.randn(n_bits, 2, 2) * 6.0, -14, 14)
    return pts.astype(np.float32)

_PATTERN = _brief_pattern()


def fast_score(img, thresh: float):
    """FAST-9 corner response for every pixel ([H,W] float image).

    Returns a score map (0 where not a corner). Vectorized: the 16
    circle samples are shifted copies of the image; a pixel passes if 9
    contiguous samples are all brighter (or all darker) than
    center +- thresh.
    """
    c = img
    samples = jnp.stack([jnp.roll(img, (-dy, -dx), (0, 1))
                         for dx, dy in _CIRCLE])          # [16,H,W]
    brighter = samples > (c + thresh)[None]
    darker = samples < (c - thresh)[None]

    def max_run(flags):
        # longest circular run of True among 16 flags, per pixel
        f2 = jnp.concatenate([flags, flags], 0)           # [32,H,W]
        run = jnp.zeros_like(f2, dtype=jnp.int32)
        run = run.at[0].set(f2[0].astype(jnp.int32))
        def body(i, r):
            return r.at[i].set(jnp.where(f2[i], r[i - 1] + 1, 0))
        run = jax.lax.fori_loop(1, 32, body, run)
        return run.max(0)

    ok = (max_run(brighter) >= 9) | (max_run(darker) >= 9)
    score = jnp.sum(jnp.abs(samples - c[None]) *
                    (brighter | darker), axis=0)
    return jnp.where(ok, score, 0.0)


def _orientation(img, xs, ys):
    """Intensity-centroid angle per keypoint (IC_Angle parity)."""
    r = _PATCH_R
    offs = jnp.arange(-r, r + 1, dtype=jnp.int32)
    dy, dx = jnp.meshgrid(offs, offs, indexing="ij")
    circ = (dx * dx + dy * dy) <= r * r
    H, W = img.shape

    def one(x, y):
        yy = jnp.clip(y + dy, 0, H - 1)
        xx = jnp.clip(x + dx, 0, W - 1)
        patch = img[yy, xx] * circ
        m10 = jnp.sum(patch * dx)
        m01 = jnp.sum(patch * dy)
        return jnp.arctan2(m01, m10)

    return jax.vmap(one)(xs, ys)


def _descriptors(img, xs, ys, angles):
    """256-bit steered BRIEF, packed into [N,32] uint8."""
    pat = jnp.asarray(_PATTERN)                            # [256,2,2]
    H, W = img.shape

    def one(x, y, a):
        ca, sa = jnp.cos(a), jnp.sin(a)
        R = jnp.array([[ca, -sa], [sa, ca]])
        p = pat @ R.T                                      # [256,2,2]
        px = jnp.clip(x + jnp.round(p[..., 0]).astype(jnp.int32),
                      0, W - 1)
        py = jnp.clip(y + jnp.round(p[..., 1]).astype(jnp.int32),
                      0, H - 1)
        v = img[py, px]                                    # [256,2]
        bits = (v[:, 0] < v[:, 1]).astype(jnp.uint8)
        return jnp.packbits(bits.reshape(32, 8), axis=1,
                            bitorder="little")[:, 0]

    return jax.vmap(one)(xs, ys, angles)


class OrbResult(NamedTuple):
    xy: jnp.ndarray         # [N,2] float (x, y) in level-0 pixels
    response: jnp.ndarray   # [N] (0 => invalid slot)
    angle: jnp.ndarray      # [N] radians
    level: jnp.ndarray      # [N] int32
    desc: jnp.ndarray       # [N,32] uint8


@partial(jax.jit, static_argnames=("max_kp", "cell"))
def _extract_level(img, thresh, max_kp, cell, lvl, inv_scale):
    H, W = img.shape
    score = fast_score(img, thresh)
    # kill borders (descriptor patch must fit)
    b = 17
    mask = jnp.zeros((H, W), bool).at[b:H - b, b:W - b].set(True)
    score = jnp.where(mask, score, 0.0)
    # grid distribution: best corner per cell (quadtree equivalent)
    gh, gw = H // cell, W // cell
    cells = score[:gh * cell, :gw * cell].reshape(gh, cell, gw, cell) \
        .transpose(0, 2, 1, 3).reshape(gh * gw, cell * cell)
    best = cells.argmax(-1)
    bscore = cells.max(-1)
    cy = (jnp.arange(gh * gw) // gw) * cell + best // cell
    cx = (jnp.arange(gh * gw) % gw) * cell + best % cell
    k = min(max_kp, gh * gw)
    top, idx = jax.lax.top_k(bscore, k)
    if k < max_kp:
        top = jnp.pad(top, (0, max_kp - k))
        idx = jnp.pad(idx, (0, max_kp - k))
    xs = cx[idx].astype(jnp.int32)
    ys = cy[idx].astype(jnp.int32)
    ang = _orientation(img, xs, ys)
    desc = _descriptors(img, xs, ys, ang)
    xy = jnp.stack([xs, ys], -1).astype(jnp.float32) * inv_scale
    return OrbResult(xy, top, ang,
                     jnp.full(max_kp, lvl, jnp.int32), desc)


class OrbExtractor:
    """Pyramidal ORB extraction (ORBextractor::operator() parity)."""

    def __init__(self, n_features: int = 500, n_levels: int = 4,
                 scale_factor: float = 1.2, fast_thresh: float = 20.0,
                 cell: int = 16):
        self.n_features = n_features
        self.n_levels = n_levels
        self.scale = scale_factor
        self.thresh = fast_thresh
        self.cell = cell

    def __call__(self, img) -> OrbResult:
        img = jnp.asarray(img, jnp.float32)
        per_level = max(self.n_features // self.n_levels, 16)
        outs = []
        cur = img
        for lvl in range(self.n_levels):
            inv = float(self.scale ** lvl)
            outs.append(_extract_level(cur, self.thresh, per_level,
                                       self.cell, lvl, inv))
            if lvl + 1 < self.n_levels:
                nh = int(img.shape[0] / self.scale ** (lvl + 1))
                nw = int(img.shape[1] / self.scale ** (lvl + 1))
                cur = jax.image.resize(img, (nh, nw), "bilinear")
        return OrbResult(*[jnp.concatenate(x) for x in zip(*outs)])


def match_descriptors(d1, d2, max_dist: int = 64):
    """Brute-force Hamming matching with cross-check; returns [M,2]
    index pairs (BinaryDescriptorMatcher role for the orb path)."""
    a = np.unpackbits(np.asarray(d1), axis=1)
    b = np.unpackbits(np.asarray(d2), axis=1)
    dist = (a[:, None] != b[None, :]).sum(-1)             # [N1,N2]
    fwd = dist.argmin(1)
    bwd = dist.argmin(0)
    i = np.arange(len(a))
    ok = (bwd[fwd] == i) & (dist[i, fwd] <= max_dist)
    return np.stack([i[ok], fwd[ok]], -1)
