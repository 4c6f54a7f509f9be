"""Pyramidal Lucas-Kanade sparse optical flow (batched, jit-safe).

Capability parity with the reference's `FeatureTrackByLK` /
`FeatureTrackByLKGpu` (`front_end/feature_utils.cpp:35-120`): pyramidal
iterative LK with forward-backward consistency check and border
rejection, replacing OpenCV CUDA SparsePyrLKOpticalFlow.

TPU-first: all features tracked simultaneously (vmap over points); the
per-level iteration is a `lax.scan`; patches gathered by bilinear
sampling. Static shapes: fixed feature capacity with validity masks.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from dynamic_vins_tpu.frontend import pyramid as pyr


def _lk_level(img0, img1, pts0, guess, radius: int, iters: int):
    """One pyramid level of iterative LK for all points.

    pts0: [N,2] positions in img0 at this level's scale.
    guess: [N,2] current flow estimate (img1 position = pts0 + guess).
    Returns refined guess [N,2] and per-point validity [N].
    """
    ix, iy = pyr.scharr_gradients(img0)

    def one_point(p0, g0):
        patch0 = pyr.sample_patch(img0, p0, radius)
        gx = pyr.sample_patch(ix, p0, radius)
        gy = pyr.sample_patch(iy, p0, radius)
        a11 = jnp.sum(gx * gx)
        a12 = jnp.sum(gx * gy)
        a22 = jnp.sum(gy * gy)
        det = a11 * a22 - a12 * a12
        ok = det > 1e-6
        inv_det = jnp.where(ok, 1.0 / jnp.maximum(det, 1e-6), 0.0)

        def body(g, _):
            patch1 = pyr.sample_patch(img1, p0 + g, radius)
            diff = patch1 - patch0
            b1 = jnp.sum(diff * gx)
            b2 = jnp.sum(diff * gy)
            du = -(a22 * b1 - a12 * b2) * inv_det
            dv = -(-a12 * b1 + a11 * b2) * inv_det
            return g + jnp.stack([du, dv]), None

        g, _ = jax.lax.scan(body, g0, None, length=iters)
        return g, ok

    return jax.vmap(one_point)(pts0, guess)


def track(pyr0: Sequence[jnp.ndarray], pyr1: Sequence[jnp.ndarray],
          pts: jnp.ndarray, valid: jnp.ndarray,
          radius: int = 10, iters: int = 10,
          fb_thresh: float = 0.5, border: int = 3,
          init_guess: jnp.ndarray | None = None,
          level_fn=None, fb_levels: int | None = None):
    """Track pts from pyramid0 to pyramid1 with fwd-bwd check.

    pts: [N,2] pixel coords at full resolution; valid: [N] bool.
    fb_levels: pyramid levels used for the backward consistency pass
    (default: all). fb_levels=1 seeds the level-0 backward track with
    the NEGATED forward flow (OpenCV's OPTFLOW_USE_INITIAL_FLOW
    reverse-check pattern) — same gate semantics, 4x fewer backward
    level kernels; on TPU the per-level Pallas call is the frontend's
    dominant device cost.
    Returns (pts1 [N,2], ok [N]).
    """
    levels = len(pyr0)
    if level_fn is None:
        level_fn = lambda a, b, p, g: _lk_level(a, b, p, g, radius,
                                                iters)
    # coarse-to-fine forward pass
    g = jnp.zeros_like(pts)
    ok = valid
    for lvl in range(levels - 1, -1, -1):
        s = 2.0 ** lvl
        g = g * 2.0 if lvl < levels - 1 else g
        gi, oki = level_fn(pyr0[lvl], pyr1[lvl], pts / s, g)
        g = jnp.where(oki[:, None], gi, g)
        ok = ok & oki
    pts1 = pts + g * 1.0  # g is at level-0 scale after the loop

    # backward pass for consistency
    n_fb = levels if fb_levels is None else max(1, min(fb_levels,
                                                       levels))
    gb = -g / (2.0 ** (n_fb - 1)) if n_fb < levels \
        else jnp.zeros_like(pts)
    for lvl in range(n_fb - 1, -1, -1):
        s = 2.0 ** lvl
        gb = gb * 2.0 if lvl < n_fb - 1 else gb
        gbi, okb = level_fn(pyr1[lvl], pyr0[lvl], pts1 / s, gb)
        gb = jnp.where(okb[:, None], gbi, gb)
        ok = ok & okb
    pts_back = pts1 + gb
    fb_err = jnp.linalg.norm(pts_back - pts, axis=-1)
    ok = ok & (fb_err < fb_thresh)

    # border check (reference InBorder, feature_utils.cpp:61-69)
    H, W = pyr0[0].shape
    ok = ok & (pts1[:, 0] >= border) & (pts1[:, 0] < W - border) \
        & (pts1[:, 1] >= border) & (pts1[:, 1] < H - border)
    return pts1, ok


def make_tracker(levels: int = 4, radius: int = 10, iters: int = 10,
                 fb_thresh: float = 0.5, border: int = 3,
                 backend: str = "auto", fb_levels: int | None = None):
    """Jit-friendly closure: (img0, img1, pts, valid) -> (pts1, ok).

    Pyramids are built inside so the whole per-frame track is one jit.
    backend: "xla" (gather-based), "pallas" (windowed TPU kernel,
    ops/lk_pallas.py — ~900x faster per level on TPU), or "auto"
    (pallas on TPU, xla elsewhere). On the pallas backend fb_levels
    defaults to 1 (seeded level-0 backward check — the per-level
    kernel launch is the frontend's dominant device cost there);
    on xla/cpu it defaults to all levels (reference-exact)."""
    if backend == "auto":
        try:
            platform = jax.devices()[0].platform
        except Exception:
            platform = "cpu"
        backend = "pallas" if platform not in ("cpu",) else "xla"

    if backend == "pallas":
        from dynamic_vins_tpu.ops import lk_pallas

        fbl = 1 if fb_levels is None else fb_levels

        def run(img0, img1, pts, valid):
            p0 = pyr.build_pyramid(img0, levels)
            p1 = pyr.build_pyramid(img1, levels)
            return track(p0, p1, pts, valid, radius=radius,
                         iters=iters, fb_thresh=fb_thresh,
                         border=border, fb_levels=fbl,
                         level_fn=lambda a, b, p, g: lk_pallas.lk_level(
                             a, b, p, g, radius=radius, iters=iters))

        return jax.jit(run)

    def run(img0, img1, pts, valid):
        p0 = pyr.build_pyramid(img0, levels)
        p1 = pyr.build_pyramid(img1, levels)
        return track(p0, p1, pts, valid, radius=radius, iters=iters,
                     fb_thresh=fb_thresh, border=border,
                     fb_levels=fb_levels)

    return jax.jit(run)


def track_by_dense_flow(flow, pts, valid, flow_back=None,
                        fb_thresh: float = 1.5, border: int = 3):
    """Track features by sampling a dense optical-flow field.

    Capability parity with `FeatureTrackByDenseFlow`
    (`front_end/feature_utils.cpp`): the reference samples its RAFT flow
    at each feature location instead of running sparse LK; here the
    field comes from `models/raft.OnlineFlowEstimator` (or an offline
    flow artifact) and all N features are one vmapped bilinear gather.

    flow: [H,W,2] forward flow (img0 -> img1), pixel units.
    pts: [N,2] positions in img0; valid: [N] bool.
    flow_back: optional [H,W,2] backward field enabling the
    forward-backward consistency check the sparse path performs.
    Returns (pts1 [N,2], ok [N]).
    """
    from dynamic_vins_tpu.frontend import pyramid as pyr

    fx = pyr.bilinear_sample(flow[..., 0], pts)
    fy = pyr.bilinear_sample(flow[..., 1], pts)
    pts1 = pts + jnp.stack([fx, fy], axis=-1)
    ok = valid
    if flow_back is not None:
        bx = pyr.bilinear_sample(flow_back[..., 0], pts1)
        by = pyr.bilinear_sample(flow_back[..., 1], pts1)
        pts_back = pts1 + jnp.stack([bx, by], axis=-1)
        ok = ok & (jnp.linalg.norm(pts_back - pts, axis=-1) < fb_thresh)
    H, W = flow.shape[:2]
    ok = ok & (pts1[:, 0] >= border) & (pts1[:, 0] < W - border) \
        & (pts1[:, 1] >= border) & (pts1[:, 1] < H - border)
    return pts1, ok
