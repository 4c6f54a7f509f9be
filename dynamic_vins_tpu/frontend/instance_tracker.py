"""Per-instance (dynamic object) feature tracking.

Capability parity with `InstsFeatManager`
(`front_end/dynamic_tracker.cpp:348` InstsTrack): per-object LK
tracking of masked features, per-object corner top-up inside the eroded
instance mask (kMaxDynamicCnt / kMinDynamicDist budgets), stereo
left->right tracking (TrackRightByPad), undistortion, and "extra
point" extraction by grid-sampling the disparity inside the mask
(`instance_feature.cpp:413` DetectExtraPoints: depth = fx*baseline/disp)
with neighbor-count outlier filtering replacing the PCL radius filter.

Host-side per-object bookkeeping; LK/corners/morphology in the shared
jitted kernels.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from dynamic_vins_tpu.estimator import box_fit
from dynamic_vins_tpu.frontend import corners, lk, pyramid as pyr
from dynamic_vins_tpu.geometry import camera as cam
from dynamic_vins_tpu.geometry import lie


@dataclass
class InstanceTrackerConfig:
    max_dynamic_cnt: int = 50        # fe_para.kMaxDynamicCnt
    min_dynamic_dist: int = 8        # fe_para.kMinDynamicDist
    levels: int = 3
    radius: int = 8
    iters: int = 10
    fb_thresh: float = 1.0
    erode_iters: int = 2
    extra_grid: int = 6              # disparity sample stride (px)
    extra_max: int = 64
    dtype: object = jnp.float32


@dataclass
class _InstState:
    pts: np.ndarray
    ids: np.ndarray
    valid: np.ndarray
    next_id: int = 0


class InstanceTracker:
    def __init__(self, config: InstanceTrackerConfig,
                 intr: cam.PinholeIntrinsics, baseline: float,
                 p_bc, q_bc):
        self.cfg = config
        self.intr = intr
        self.baseline = baseline
        self.p_bc = np.asarray(p_bc)
        self.q_bc = np.asarray(q_bc)
        self._insts: Dict[int, _InstState] = {}
        self.prev_img = None
        self._tracker = lk.make_tracker(config.levels, config.radius,
                                        config.iters, config.fb_thresh)
        self._und = jax.jit(
            lambda uv: cam.normalized_from_pixel(self.intr, uv))
        self._fid_base = 0

    def track(self, img, masks: Dict[int, np.ndarray],
              img_right=None, disparity=None, ego_pose=None):
        """Track all instances in one frame.

        masks: {track_id: bool [H,W]} instance masks (already associated
        by MOT). disparity: optional [H,W] float; ego_pose: (p_wb, q_wb)
        needed to express extra points in world.
        Returns {track_id: dict(features={fid: (pt_l, pt_r|None)},
        extra_pts_world)} in the InstanceManager.push_frame format.
        """
        cfg = self.cfg
        img_j = jnp.asarray(img, cfg.dtype)
        out = {}

        for tid, mask in masks.items():
            mask_er = np.asarray(pyr.erode3(jnp.asarray(mask),
                                            cfg.erode_iters))
            st = self._insts.get(tid)
            N = cfg.max_dynamic_cnt
            if st is None:
                st = _InstState(np.zeros((N, 2), np.float32),
                                np.full(N, -1, np.int64),
                                np.zeros(N, bool))
                self._insts[tid] = st

            # 1. LK track previous points
            if self.prev_img is not None and st.valid.any():
                pts1, ok = self._tracker(self.prev_img, img_j,
                                         jnp.asarray(st.pts, cfg.dtype),
                                         jnp.asarray(st.valid))
                pts1 = np.asarray(pts1)
                ok = np.asarray(ok) & st.valid
                ok &= self._mask_ok(mask_er, pts1)
                st.pts = np.where(ok[:, None], pts1, st.pts)
                st.valid = ok
            else:
                st.valid[:] = False

            # 2. top-up inside eroded mask
            need = N - int(st.valid.sum())
            if need > 0:
                new_pts, _, found = corners.detect(
                    img_j, max_corners=N,
                    min_dist=cfg.min_dynamic_dist,
                    exclude_pts=jnp.asarray(st.pts, cfg.dtype),
                    exclude_valid=jnp.asarray(st.valid), border=2)
                new_pts = np.asarray(new_pts)
                found = np.asarray(found) & self._mask_ok(mask_er,
                                                          new_pts)
                free = np.flatnonzero(~st.valid)
                cand = np.flatnonzero(found)[:free.size]
                slots = free[:cand.size]
                st.pts[slots] = new_pts[cand]
                st.ids[slots] = (self._fid_base
                                 + np.arange(cand.size))
                self._fid_base += cand.size
                st.valid[slots] = True

            # 3. stereo left->right
            right_pts = {}
            if img_right is not None and st.valid.any():
                img_r = jnp.asarray(img_right, cfg.dtype)
                pts_r, ok_r = self._tracker(
                    img_j, img_r, jnp.asarray(st.pts, cfg.dtype),
                    jnp.asarray(st.valid))
                pts_r = np.asarray(pts_r)
                ok_r = np.asarray(ok_r) & st.valid
                und_r = np.asarray(self._und(
                    jnp.asarray(pts_r, cfg.dtype)))
                for i in np.flatnonzero(ok_r):
                    right_pts[i] = und_r[i]

            und = np.asarray(self._und(jnp.asarray(st.pts, cfg.dtype)))
            feats = {}
            for i in np.flatnonzero(st.valid):
                pl = np.array([und[i, 0], und[i, 1], 1.0])
                pr = None
                if i in right_pts:
                    pr = np.array([right_pts[i][0], right_pts[i][1],
                                   1.0])
                feats[int(st.ids[i])] = (pl, pr)

            # 4. extra points from disparity grid sampling
            extra_world = None
            if disparity is not None and ego_pose is not None:
                extra_world = self._extra_points(mask_er, disparity,
                                                 ego_pose)
            out[tid] = dict(features=feats,
                            extra_pts_world=extra_world)

        # drop state of instances not present this frame
        gone = [t for t in self._insts if t not in masks]
        for t in gone:
            del self._insts[t]
        self.prev_img = img_j
        return out

    def _extra_points(self, mask, disparity, ego_pose):
        """DetectExtraPoints (instance_feature.cpp:413): grid-sample
        masked disparity -> 3D points; outlier-filter; world frame."""
        cfg = self.cfg
        H, W = mask.shape
        g = cfg.extra_grid
        ys, xs = np.mgrid[g // 2:H:g, g // 2:W:g]
        ys, xs = ys.ravel(), xs.ravel()
        sel = mask[ys, xs]
        disp = np.asarray(disparity)[ys, xs]
        sel &= disp > 0.5
        ys, xs, disp = ys[sel], xs[sel], disp[sel]
        if len(xs) < 4:
            return None
        fx = float(self.intr.fx)
        depth = fx * self.baseline / disp
        ok = (depth > 0.5) & (depth < 80.0)
        ys, xs, depth = ys[ok], xs[ok], depth[ok]
        if len(xs) < 4:
            return None
        und = np.asarray(self._und(jnp.asarray(
            np.stack([xs, ys], -1), cfg.dtype)))
        pts_c = np.concatenate([und * depth[:, None], depth[:, None]],
                               axis=1)
        # camera -> world
        p_wb, q_wb = ego_pose
        p_wc, q_wc = lie.pose_compose(
            jnp.asarray(p_wb), jnp.asarray(q_wb),
            jnp.asarray(self.p_bc), jnp.asarray(self.q_bc))
        pts_w = np.asarray(lie.pose_transform_point(
            p_wc[None, :], q_wc[None, :], jnp.asarray(pts_c)))
        # neighbor-count outlier filter (replaces PCL radius filter)
        cap = cfg.extra_max
        if len(pts_w) > cap:
            idx = np.linspace(0, len(pts_w) - 1, cap).astype(int)
            pts_w = pts_w[idx]
        valid = jnp.ones(len(pts_w), bool)
        keep = np.asarray(box_fit.largest_cluster(
            jnp.asarray(pts_w), valid, radius=1.5))
        return pts_w[keep]

    @staticmethod
    def _mask_ok(mask, pts):
        H, W = mask.shape
        xi = np.clip(pts[:, 0].astype(int), 0, W - 1)
        yi = np.clip(pts[:, 1].astype(int), 0, H - 1)
        return mask[yi, xi]
