"""Shi-Tomasi corner detection with min-distance spacing (jit-safe).

Capability parity with `cv::goodFeaturesToTrack` + the min-dist mask
top-up the reference uses (`background_tracker.cpp`, fe_para.kMinDist):
min-eigenvalue response, 3x3 NMS, exclusion mask around existing
features, and top-K selection — all static-shaped.

TPU-first: response + NMS are convolutions/pools (VPU); spacing is
enforced by a min-dist grid (one winner per cell) instead of the
reference's sequential mask-painting loop, then top-K by response.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from dynamic_vins_tpu.frontend import pyramid as pyr


def shi_tomasi_response(img, block: int = 3):
    """Min-eigenvalue corner response map [H,W]."""
    ix, iy = pyr.scharr_gradients(img)
    ixx, ixy, iyy = ix * ix, ix * iy, iy * iy

    def box(a):
        r = block // 2
        p = jnp.pad(a, r, mode="edge")
        h, w = a.shape
        out = jnp.zeros_like(a)
        for i in range(block):
            for j in range(block):
                out = out + p[i:i + h, j:j + w]
        return out / (block * block)

    sxx, sxy, syy = box(ixx), box(ixy), box(iyy)
    tr = sxx + syy
    det_term = jnp.sqrt(jnp.maximum((sxx - syy) ** 2 + 4.0 * sxy * sxy,
                                    0.0))
    return 0.5 * (tr - det_term)


@partial(jax.jit,
         static_argnames=("max_corners", "min_dist", "border"))
def detect(img, max_corners: int, min_dist: int = 16,
           quality: float = 0.01, exclude_pts=None, exclude_valid=None,
           border: int = 8, allow_mask=None):
    """Detect up to max_corners corners.

    Returns (pts [K,2] float, score [K], found [K] bool), K=max_corners.
    exclude_pts/[N,2]+exclude_valid: existing features — corners within
    min_dist of them are suppressed (the reference's mask circles).
    allow_mask: optional [H,W] bool — candidates restricted to True
    pixels (the per-instance eroded-mask top-up region,
    dynamic_tracker.cpp:417-444).
    """
    H, W = img.shape
    resp = shi_tomasi_response(img)
    if allow_mask is not None:
        resp = jnp.where(allow_mask, resp, -1.0)

    # 3x3 non-max suppression
    p = jnp.pad(resp, 1, mode="constant", constant_values=-1.0)
    neigh = jnp.stack([p[i:i + H, j:j + W]
                       for i in range(3) for j in range(3)])
    is_max = resp >= jnp.max(neigh, axis=0)
    thresh = quality * jnp.max(resp)
    cand = is_max & (resp > thresh)

    # border suppression
    yy = jnp.arange(H)[:, None]
    xx = jnp.arange(W)[None, :]
    cand = cand & (xx >= border) & (xx < W - border) \
        & (yy >= border) & (yy < H - border)

    # exclusion mask: distance to existing features via a dilated splat
    if exclude_pts is not None:
        excl = jnp.zeros((H, W), bool)
        xi = jnp.clip(exclude_pts[:, 0].astype(jnp.int32), 0, W - 1)
        yi = jnp.clip(exclude_pts[:, 1].astype(jnp.int32), 0, H - 1)
        val = exclude_valid if exclude_valid is not None else \
            jnp.ones(exclude_pts.shape[0], bool)
        excl = excl.at[yi, xi].max(val)
        # dilate to min_dist radius (log-steps of 3x3 dilation)
        it = max(1, min_dist // 2)
        excl = pyr.dilate3(excl, iterations=it)
        cand = cand & ~excl

    score = jnp.where(cand, resp, -1.0)

    # min-dist grid: keep only the best candidate per (min_dist) cell
    gh = (H + min_dist - 1) // min_dist
    gw = (W + min_dist - 1) // min_dist
    pad_h = gh * min_dist - H
    pad_w = gw * min_dist - W
    sp = jnp.pad(score, ((0, pad_h), (0, pad_w)), constant_values=-1.0)
    cells = sp.reshape(gh, min_dist, gw, min_dist).transpose(0, 2, 1, 3)
    cells = cells.reshape(gh, gw, min_dist * min_dist)
    best_in_cell = jnp.argmax(cells, axis=-1)
    best_val = jnp.take_along_axis(cells, best_in_cell[..., None],
                                   axis=-1)[..., 0]
    cell_y = best_in_cell // min_dist
    cell_x = best_in_cell % min_dist
    ys = (jnp.arange(gh)[:, None] * min_dist + cell_y).reshape(-1)
    xs = (jnp.arange(gw)[None, :] * min_dist + cell_x).reshape(-1)
    vals = best_val.reshape(-1)

    # top-K cells by response
    k = min(max_corners, vals.shape[0])
    top_val, top_idx = jax.lax.top_k(vals, k)
    pts = jnp.stack([xs[top_idx].astype(img.dtype),
                     ys[top_idx].astype(img.dtype)], axis=-1)
    found = top_val > 0.0
    if k < max_corners:
        pad = max_corners - k
        pts = jnp.concatenate([pts, jnp.zeros((pad, 2), img.dtype)])
        top_val = jnp.concatenate([top_val, -jnp.ones(pad, img.dtype)])
        found = jnp.concatenate([found, jnp.zeros(pad, bool)])
    return pts, top_val, found
