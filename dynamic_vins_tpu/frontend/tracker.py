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

        # ---- fused per-frame step: ONE dispatch + ONE packed fetch.
        # On remote-attached chips each host<->device sync costs a
        # tunnel round trip (~25-80 ms measured); the unfused tracker
        # had 4-6 of them per frame.
        tracker = self._tracker
        intr_l, intr_r = self.intr_left, self.intr_right
        mind, bord = config.min_dist, config.border

        def _mask_at(mask, pts, H, W):
            xi = jnp.clip(pts[:, 0].astype(jnp.int32), 0, W - 1)
            yi = jnp.clip(pts[:, 1].astype(jnp.int32), 0, H - 1)
            return mask[yi, xi]

        def _fused(prev_img, img, img_r, pts, valid, mask, use_right):
            H, W = img.shape
            p1, ok = tracker(prev_img, img, pts, valid)
            ok = ok & valid & _mask_at(mask, p1, H, W)
            pts_a = jnp.where(ok[:, None], p1, pts)

            cpts, cscore, cfound = corners.detect(
                img, max_corners=N, min_dist=mind, exclude_pts=pts_a,
                exclude_valid=ok, border=bord)
            cfound = cfound & _mask_at(mask, cpts, H, W)
            # greedy slot assignment: found corners are a score-sorted
            # prefix; free slots (invalid-first) take them in order
            free = jnp.argsort(ok, stable=True)          # invalid first
            num_free = N - jnp.sum(ok)
            take = (jnp.arange(N) < num_free) & cfound
            pts_b = pts_a.at[free].set(
                jnp.where(take[:, None], cpts, pts_a[free]))
            newly = jnp.zeros(N, bool).at[free].set(take)
            valid_b = ok | newly

            und = cam.normalized_from_pixel(intr_l, pts_b)
            if use_right:
                pr, okr = tracker(img, img_r, pts_b, valid_b)
                und_r = cam.normalized_from_pixel(intr_r, pr)
            else:
                pr = pts_b
                okr = jnp.zeros(N, bool)
                und_r = und
            f = lambda a: a.astype(jnp.float32).ravel()
            return jnp.concatenate([
                f(pts_b), f(und), f(und_r), f(ok), f(newly), f(okr)])

        self._fused = {
            True: jax.jit(lambda *a: _fused(*a, True)),
            False: jax.jit(lambda *a: _fused(*a, False))}

        # dense-flow variant (use_dense_flow: the reference's
        # FeatureTrackByDenseFlow, feature_utils.cpp:213, samples the
        # RAFT field at each feature instead of running temporal LK;
        # stereo left->right stays sparse LK). Same fused single
        # dispatch, flow field replacing the prev->cur track.
        fbt = config.fb_thresh

        def _fused_flow(img, img_r, flow, pts, valid, mask, use_right):
            H, W = img.shape
            p1, ok = lk.track_by_dense_flow(flow, pts, valid,
                                            fb_thresh=fbt, border=bord)
            ok = ok & valid & _mask_at(mask, p1, H, W)
            pts_a = jnp.where(ok[:, None], p1, pts)

            cpts, cscore, cfound = corners.detect(
                img, max_corners=N, min_dist=mind, exclude_pts=pts_a,
                exclude_valid=ok, border=bord)
            cfound = cfound & _mask_at(mask, cpts, H, W)
            free = jnp.argsort(ok, stable=True)
            num_free = N - jnp.sum(ok)
            take = (jnp.arange(N) < num_free) & cfound
            pts_b = pts_a.at[free].set(
                jnp.where(take[:, None], cpts, pts_a[free]))
            newly = jnp.zeros(N, bool).at[free].set(take)
            valid_b = ok | newly

            und = cam.normalized_from_pixel(intr_l, pts_b)
            if use_right:
                pr, okr = tracker(img, img_r, pts_b, valid_b)
                und_r = cam.normalized_from_pixel(intr_r, pr)
            else:
                pr = pts_b
                okr = jnp.zeros(N, bool)
                und_r = und
            f = lambda a: a.astype(jnp.float32).ravel()
            return jnp.concatenate([
                f(pts_b), f(und), f(und_r), f(ok), f(newly), f(okr)])

        self._fused_flow = {
            True: jax.jit(lambda *a: _fused_flow(*a, True)),
            False: jax.jit(lambda *a: _fused_flow(*a, False))}

    def track(self, img, timestamp: float, mask=None,
              img_right=None, flow=None) -> FrameFeatures:
        """Process one (grayscale float [H,W]) frame; returns features.

        mask: optional [H,W] bool — True where tracking is ALLOWED
        (the reference's inv_merge_mask semantics).
        flow: optional [H,W,2] dense prev->cur flow field; when given,
        features are tracked by sampling it (use_dense_flow mode)
        instead of sparse temporal LK."""
        cfg = self.cfg
        N = cfg.max_cnt
        img = jnp.asarray(img, cfg.dtype)
        H, W = img.shape

        use_right = bool(cfg.stereo and img_right is not None)
        img_r = jnp.asarray(img_right, cfg.dtype) if use_right else img
        mask_dev = jnp.ones((H, W), bool) if mask is None \
            else jnp.asarray(mask)
        prev = self.prev_img if self.prev_img is not None else img
        valid_in = self.valid if self.prev_img is not None \
            else np.zeros(N, bool)

        if flow is not None and self.prev_img is not None:
            out = np.array(self._fused_flow[use_right](
                img, img_r, jnp.asarray(flow, cfg.dtype),
                jnp.asarray(self.pts, cfg.dtype),
                jnp.asarray(valid_in), mask_dev))
        else:
            out = np.array(self._fused[use_right](
                prev, img, img_r, jnp.asarray(self.pts, cfg.dtype),
                jnp.asarray(valid_in), mask_dev))
        pts_b, und, und_r, okf, newf, okrf = np.split(
            out, np.cumsum([2 * N, 2 * N, 2 * N, N, N]))
        self.pts = pts_b.reshape(N, 2).astype(np.float32)
        und = und.reshape(N, 2)
        und_r = und_r.reshape(N, 2)
        tracked = okf > 0.5
        newly = newf > 0.5
        ok_r = (okrf > 0.5)

        # host bookkeeping: track counts + ids for new slots
        self.track_cnt = np.where(tracked, self.track_cnt + 1, 0)
        slots = np.flatnonzero(newly)
        self.ids[slots] = np.arange(self._next_id,
                                    self._next_id + slots.size)
        self._next_id += slots.size
        self.track_cnt[slots] = 1
        self.valid = tracked | newly

        # 2b. epipolar outlier rejection (FeatureTracker::rejectWithF)
        if cfg.use_ransac_f and self.prev_und is not None \
                and int((self.valid & (self.track_cnt > 1)).sum()) >= 15:
            try:
                import cv2

                sel = np.flatnonzero(self.valid & (self.track_cnt > 1))
                p_prev = self.prev_und[sel] * cfg.focal
                p_cur = und[sel] * cfg.focal
                _, inl = cv2.findFundamentalMat(
                    p_prev, p_cur, cv2.FM_RANSAC,
                    cfg.f_threshold_px, 0.99)
                if inl is not None:
                    bad = sel[~inl.ravel().astype(bool)]
                    self.valid[bad] = False
            except Exception:
                pass

        # 3. velocity (und computed above)
        dt = (timestamp - self.prev_time) if self.prev_time else 1.0
        dt = max(dt, 1e-3)
        vel = np.zeros_like(und)
        cont = self.valid & (self.track_cnt > 1)
        vel[cont] = (und[cont] - self.prev_und[cont]) / dt

        # 4. stereo obs (computed in the fused step)
        right = {}
        if use_right:
            for i in np.flatnonzero(ok_r & self.valid):
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
