"""Background feature tracker: LK tracking + corner top-up + stereo.

Capability parity with `FeatureTracker`
(`front_end/background_tracker.cpp`): per frame —
  * LK-track previous features into the current frame (fwd/bwd check,
    border check, optional mask rejection)       [TrackImage/-Naive/-Semantic]
  * sort survivors by track count and enforce min-dist spacing
  * top-up to `max_cnt` with new Shi-Tomasi corners outside the mask
  * left->right LK for stereo observations
  * undistort to normalized coords + pixel velocity

Host-side id/track bookkeeping; all image math in jitted kernels.
Emits the estimator's FrameFeatures dict.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from dynamic_vins_tpu.estimator.estimator import FrameFeatures
from dynamic_vins_tpu.frontend import corners, lk, pyramid as pyr
from dynamic_vins_tpu.geometry import camera as cam


@dataclass
class TrackerConfig:
    max_cnt: int = 150            # fe_para.kMaxCnt (yaml: 250 KITTI)
    min_dist: int = 16            # fe_para.kMinDist
    levels: int = 4
    radius: int = 10
    iters: int = 10
    fb_thresh: float = 0.5
    border: int = 8
    stereo: bool = True
    use_ransac_f: bool = True     # rejectWithF (F_threshold yaml key)
    f_threshold_px: float = 1.0
    focal: float = 460.0
    dtype: object = jnp.float32


class FeatureTracker:
    def __init__(self, config: TrackerConfig,
                 intr_left: cam.PinholeIntrinsics,
                 intr_right: Optional[cam.PinholeIntrinsics] = None):
        self.cfg = config
        self.intr_left = intr_left
        self.intr_right = intr_right if intr_right is not None else \
            intr_left
        N = config.max_cnt
        self.pts = np.zeros((N, 2), np.float32)
        self.ids = np.full(N, -1, np.int64)
        self.track_cnt = np.zeros(N, np.int32)
        self.valid = np.zeros(N, bool)
        self.prev_img = None
        self.prev_und = np.zeros((N, 2), np.float32)
        self.prev_time = None
        self._next_id = 0
        self._tracker = lk.make_tracker(config.levels, config.radius,
                                        config.iters, config.fb_thresh,
                                        config.border)
        self._und_left = jax.jit(
            lambda uv: cam.normalized_from_pixel(self.intr_left, uv))
        self._und_right = jax.jit(
            lambda uv: cam.normalized_from_pixel(self.intr_right, uv))

    def track(self, img, timestamp: float, mask=None,
              img_right=None) -> FrameFeatures:
        """Process one (grayscale float [H,W]) frame; returns features.

        mask: optional [H,W] bool — True where tracking is ALLOWED
        (the reference's inv_merge_mask semantics)."""
        cfg = self.cfg
        N = cfg.max_cnt
        img = jnp.asarray(img, cfg.dtype)

        # 1. LK track previous -> current
        if self.prev_img is not None and self.valid.any():
            pts1, ok = self._tracker(self.prev_img, img,
                                     jnp.asarray(self.pts, cfg.dtype),
                                     jnp.asarray(self.valid))
            pts1 = np.array(pts1)
            ok = np.array(ok) & self.valid
            if mask is not None:
                ok &= self._mask_ok(mask, pts1)
            self.pts = np.where(ok[:, None], pts1, self.pts)
            self.valid = ok
            self.track_cnt = np.where(ok, self.track_cnt + 1, 0)
        else:
            self.valid[:] = False

        # 2. top-up with new corners (outside mask + existing features)
        n_alive = int(self.valid.sum())
        need = N - n_alive
        if need > 0:
            excl_pts = jnp.asarray(self.pts, cfg.dtype)
            excl_valid = jnp.asarray(self.valid)
            new_pts, _, found = corners.detect(
                img, max_corners=N, min_dist=cfg.min_dist,
                exclude_pts=excl_pts, exclude_valid=excl_valid,
                border=cfg.border)
            new_pts = np.asarray(new_pts)
            found = np.array(found)
            if mask is not None:
                found &= self._mask_ok(mask, new_pts)
            free = np.flatnonzero(~self.valid)
            cand = np.flatnonzero(found)[:free.size]
            slots = free[:cand.size]
            self.pts[slots] = new_pts[cand]
            self.ids[slots] = np.arange(self._next_id,
                                        self._next_id + cand.size)
            self._next_id += cand.size
            self.track_cnt[slots] = 1
            self.valid[slots] = True

        # 2b. epipolar outlier rejection (FeatureTracker::rejectWithF)
        if cfg.use_ransac_f and self.prev_und is not None \
                and int((self.valid & (self.track_cnt > 1)).sum()) >= 15:
            try:
                import cv2

                sel = np.flatnonzero(self.valid & (self.track_cnt > 1))
                cur_und = np.asarray(self._und_left(
                    jnp.asarray(self.pts, cfg.dtype)))
                p_prev = self.prev_und[sel] * cfg.focal
                p_cur = cur_und[sel] * cfg.focal
                _, inl = cv2.findFundamentalMat(
                    p_prev, p_cur, cv2.FM_RANSAC,
                    cfg.f_threshold_px, 0.99)
                if inl is not None:
                    bad = sel[~inl.ravel().astype(bool)]
                    self.valid[bad] = False
            except Exception:
                pass

        # 3. undistort + velocity
        und = np.asarray(self._und_left(jnp.asarray(self.pts,
                                                    cfg.dtype)))
        dt = (timestamp - self.prev_time) if self.prev_time else 1.0
        dt = max(dt, 1e-3)
        vel = np.zeros_like(und)
        cont = self.valid & (self.track_cnt > 1)
        vel[cont] = (und[cont] - self.prev_und[cont]) / dt

        # 4. stereo: left -> right LK
        right = {}
        if cfg.stereo and img_right is not None and self.valid.any():
            img_r = jnp.asarray(img_right, cfg.dtype)
            pts_r, ok_r = self._tracker(img, img_r,
                                        jnp.asarray(self.pts, cfg.dtype),
                                        jnp.asarray(self.valid))
            pts_r = np.asarray(pts_r)
            ok_r = np.asarray(ok_r) & self.valid
            und_r = np.asarray(self._und_right(jnp.asarray(pts_r,
                                                           cfg.dtype)))
            for i in np.flatnonzero(ok_r):
                right[i] = und_r[i]

        feats = {}
        for i in np.flatnonzero(self.valid):
            pl = np.array([und[i, 0], und[i, 1], 1.0])
            vl = np.array([vel[i, 0], vel[i, 1], 0.0])
            if i in right:
                pr = np.array([right[i][0], right[i][1], 1.0])
                feats[int(self.ids[i])] = (pl, vl, pr, np.zeros(3))
            else:
                feats[int(self.ids[i])] = (pl, vl, None, None)

        self.prev_img = img
        self.prev_und = und
        self.prev_time = timestamp
        return FrameFeatures(timestamp, feats)

    @staticmethod
    def _mask_ok(mask, pts):
        m = np.asarray(mask)
        H, W = m.shape
        xi = np.clip(pts[:, 0].astype(int), 0, W - 1)
        yi = np.clip(pts[:, 1].astype(int), 0, H - 1)
        return m[yi, xi]
