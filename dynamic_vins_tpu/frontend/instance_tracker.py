"""Per-instance (dynamic object) feature tracking — batched.

Capability parity with `InstsFeatManager`
(`front_end/dynamic_tracker.cpp:348` InstsTrack): per-object LK
tracking of masked features, per-object corner top-up inside the eroded
instance mask (kMaxDynamicCnt / kMinDynamicDist budgets), stereo
left->right tracking (TrackRightByPad), undistortion, and "extra
point" extraction by grid-sampling the disparity inside the mask
(`instance_feature.cpp:413` DetectExtraPoints: depth = fx*baseline/disp)
with cluster-keep outlier filtering replacing PCL radius+Euclidean
clustering.

TPU-first: where the reference pads per-object ROIs and launches one
CUDA LK per instance (`InstanceImagePadding`, feature_utils.cpp:406),
here ALL K instances ride ONE fused device dispatch per frame — the
K*N feature points are tracked together on the full-image pyramids,
corner candidates for every instance come from one masked Shi-Tomasi
pass, and the disparity extra points of all K objects go through one
vmapped cluster filter. Dispatch count per dynamic frame is O(1),
independent of K (the serial per-instance loop cost O(K) tunnel round
trips per frame).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from dynamic_vins_tpu.estimator import box_fit
from dynamic_vins_tpu.frontend import corners, lk
from dynamic_vins_tpu.geometry import camera as cam
from dynamic_vins_tpu.geometry import lie_np


@dataclass
class InstanceTrackerConfig:
    max_dynamic_cnt: int = 50        # fe_para.kMaxDynamicCnt
    min_dynamic_dist: int = 8        # fe_para.kMinDynamicDist
    max_instances: int = 8           # batched instance capacity
    levels: int = 3
    radius: int = 8
    iters: int = 10
    fb_thresh: float = 1.0
    erode_iters: int = 2
    extra_grid: int = 6              # disparity sample stride (px)
    extra_max: int = 64
    cluster_radius: float = 1.5
    dtype: object = jnp.float32


class InstTrackHandle(NamedTuple):
    """In-flight instance-tracker frame (dispatched, not collected)."""

    packed: object               # device array, async-copying to host
    present: tuple               # tids tracked this frame
    eroded: dict                 # tid -> eroded mask (host)
    use_right: bool
    use_extra: bool


def _erode3_np(m: np.ndarray, iters: int) -> np.ndarray:
    """3x3 binary erosion, host numpy (cheap vs a device round trip)."""
    for _ in range(iters):
        p = np.pad(m, 1, constant_values=False)
        m = (p[:-2, 1:-1] & p[2:, 1:-1] & p[1:-1, :-2] & p[1:-1, 2:]
             & p[1:-1, 1:-1] & p[:-2, :-2] & p[:-2, 2:] & p[2:, :-2]
             & p[2:, 2:])
    return m


class InstanceTracker:
    def __init__(self, config: InstanceTrackerConfig,
                 intr: cam.PinholeIntrinsics, baseline: float,
                 p_bc, q_bc):
        self.cfg = config
        self.intr = intr
        self.baseline = baseline
        self.p_bc = np.asarray(p_bc)
        self.q_bc = np.asarray(q_bc)
        K, N, E = config.max_instances, config.max_dynamic_cnt, \
            config.extra_max
        self.pts = np.zeros((K, N, 2), np.float32)
        self.ids = np.full((K, N), -1, np.int64)
        self.valid = np.zeros((K, N), bool)
        self._row_of: Dict[int, int] = {}       # tid -> row
        self.prev_img = None
        self._fid_base = 0

        tracker = lk.make_tracker(config.levels, config.radius,
                                  config.iters, config.fb_thresh)
        intr_l = self.intr
        CAND = self._CAND = K * N // 2 if K * N >= 64 else K * N
        mind = config.min_dynamic_dist
        crad = config.cluster_radius
        dt = config.dtype

        def _fused(prev_img, imgs, pts, valid, allow_mask,
                   ex_uv, ex_depth, ex_valid, p_wc, q_wc,
                   use_right, use_extra):
            """imgs [1|2,H,W] native dtype (shared upload with the
            feature tracker — cast on device); pts [K*N,2], valid
            [K*N]; allow_mask [H,W] True inside the merged eroded
            instance masks; ex_* [K,E,...]. Returns (img_f32, packed):
            the cast left image stays device-resident as prev_img."""
            img = imgs[0].astype(dt)
            img_r = imgs[1].astype(dt) if use_right else img
            p1, ok = tracker(prev_img, img, pts, valid)
            ok = ok & valid
            p1 = jnp.where(ok[:, None], p1, pts)
            und = cam.normalized_from_pixel(intr_l, p1)

            if use_right:
                pr, okr = tracker(img, img_r, p1, ok)
                und_r = cam.normalized_from_pixel(intr_l, pr)
            else:
                okr = jnp.zeros_like(ok)
                und_r = und

            cpts, cscore, cfound = corners.detect(
                img, max_corners=CAND, min_dist=mind,
                exclude_pts=p1, exclude_valid=ok, border=2,
                allow_mask=allow_mask)
            und_c = cam.normalized_from_pixel(intr_l, cpts)

            if use_extra:
                from dynamic_vins_tpu.geometry import lie

                und_e = cam.normalized_from_pixel(
                    intr_l, ex_uv.reshape(-1, 2)).reshape(*ex_uv.shape)
                pc = jnp.concatenate(
                    [und_e * ex_depth[..., None], ex_depth[..., None]],
                    axis=-1)                               # [K,E,3]
                pw = lie.quat_rotate(q_wc[None, None, :], pc) \
                    + p_wc[None, None, :]
                keep = jax.vmap(
                    lambda p, v: box_fit.largest_cluster(p, v,
                                                         radius=crad)
                )(pw, ex_valid)
            else:
                pw = jnp.zeros(ex_uv.shape[:2] + (3,), dt)
                keep = jnp.zeros(ex_uv.shape[:2], bool)

            f = lambda a: a.astype(jnp.float32).ravel()
            return img, jnp.concatenate([
                f(p1), f(und), f(und_r), f(ok), f(okr),
                f(cpts), f(und_c), f(cfound), f(pw), f(keep)])

        self._fused = {
            (ur, ue): jax.jit(lambda *a, _ur=ur, _ue=ue:
                              _fused(*a, _ur, _ue))
            for ur in (False, True) for ue in (False, True)}
        self._cast0 = jax.jit(lambda imgs: imgs[0].astype(dt))

    # ------------------------------------------------------------------
    def track(self, img, masks: Dict[int, np.ndarray],
              img_right=None, disparity=None, ego_pose=None):
        """Track all instances in one frame — one device dispatch.

        masks: {track_id: bool [H,W]} instance masks (already associated
        by MOT). disparity: optional [H,W] float; ego_pose: (p_wb, q_wb)
        needed to express extra points in world.
        Returns {track_id: dict(features={fid: (pt_l, pt_r|None)},
        extra_pts_world)} in the InstanceManager.push_frame format.
        """
        return self.track_collect(self.track_begin(
            img, masks, img_right=img_right, disparity=disparity,
            ego_pose=ego_pose))

    def track_begin(self, img, masks: Dict[int, np.ndarray],
                    img_right=None, disparity=None, ego_pose=None,
                    imgs_dev=None):
        """Host pre-work + ONE fused dispatch; the packed result copies
        to host asynchronously. `track_collect` must run before the
        next `track_begin` (host slot state feeds the next dispatch) —
        the System's dynamic pipeline orders collect(k-1) before
        begin(k), so the device round trip of frame k overlaps the
        backend solve of frame k-1 (the reference gets the same overlap
        from its FeatureTrack/ProcessMeasurements threads)."""
        cfg = self.cfg
        K, N, E = cfg.max_instances, cfg.max_dynamic_cnt, cfg.extra_max

        # drop state of instances not present this frame; assign rows
        for tid in [t for t in self._row_of if t not in masks]:
            r = self._row_of.pop(tid)
            self.valid[r] = False
            self.ids[r] = -1
        used = set(self._row_of.values())
        present = []
        for tid in list(masks.keys())[:K]:
            if tid not in self._row_of:
                free = next((r for r in range(K) if r not in used),
                            None)
                if free is None:
                    continue              # over capacity: skip tid
                used.add(free)
                self._row_of[tid] = free
                self.valid[free] = False
                self.ids[free] = -1
            present.append(tid)
        # ONE shared [1|2,H,W] upload per frame (System passes the same
        # stack the feature tracker consumed; a duplicate full-image
        # H2D costs ~25 ms/frame through the ~30 MB/s tunnel)
        if imgs_dev is None:
            img_np = np.asarray(img)
            if img_right is not None:
                stack = np.stack([img_np,
                                  np.asarray(img_right, img_np.dtype)])
            else:
                stack = img_np[None]
            imgs_dev = jnp.asarray(stack)
        if not present:
            self.prev_img = self._cast0(imgs_dev)
            return InstTrackHandle(None, (), {}, False, False)

        H, W = img.shape

        # host: eroded masks + merged allow-mask + extra-point sampling
        eroded = {tid: _erode3_np(np.asarray(masks[tid]),
                                  cfg.erode_iters) for tid in present}
        allow = np.zeros((H, W), bool)
        for tid in present:
            allow |= eroded[tid]

        use_extra = disparity is not None and ego_pose is not None
        ex_uv = np.zeros((K, E, 2), np.float32)
        ex_depth = np.zeros((K, E), np.float32)
        ex_valid = np.zeros((K, E), bool)
        if use_extra:
            disp_np = np.asarray(disparity)
            fx = float(self.intr.fx)
            g = cfg.extra_grid
            for tid in present:
                r = self._row_of[tid]
                ys, xs = np.mgrid[g // 2:H:g, g // 2:W:g]
                ys, xs = ys.ravel(), xs.ravel()
                sel = eroded[tid][ys, xs]
                d = disp_np[ys, xs]
                sel &= d > 0.5
                ys, xs, d = ys[sel], xs[sel], d[sel]
                depth = fx * self.baseline / np.maximum(d, 1e-6)
                okd = (depth > 0.5) & (depth < 80.0)
                ys, xs, depth = ys[okd], xs[okd], depth[okd]
                if len(xs) < 4:
                    continue
                if len(xs) > E:
                    idx = np.linspace(0, len(xs) - 1, E).astype(int)
                    ys, xs, depth = ys[idx], xs[idx], depth[idx]
                n = len(xs)
                ex_uv[r, :n] = np.stack([xs, ys], -1)
                ex_depth[r, :n] = depth
                ex_valid[r, :n] = True

        if ego_pose is not None:
            p_wb, q_wb = ego_pose
            p_wc, q_wc = lie_np.pose_compose(
                np.asarray(p_wb, float), np.asarray(q_wb, float),
                self.p_bc, self.q_bc)
        else:
            p_wc, q_wc = np.zeros(3), np.array([1.0, 0, 0, 0])

        use_right = int(imgs_dev.shape[0]) >= 2
        first = self.prev_img is None
        prev = self.prev_img if not first else self._cast0(imgs_dev)
        valid_in = self.valid.reshape(-1) if not first \
            else np.zeros(K * N, bool)

        # ---- ONE fused dispatch (fetch happens in track_collect) -----
        img_res, packed = self._fused[(use_right, use_extra)](
            prev, imgs_dev,
            jnp.asarray(self.pts.reshape(-1, 2), cfg.dtype),
            jnp.asarray(valid_in), jnp.asarray(allow),
            jnp.asarray(ex_uv), jnp.asarray(ex_depth),
            jnp.asarray(ex_valid),
            jnp.asarray(p_wc, cfg.dtype), jnp.asarray(q_wc, cfg.dtype))
        from dynamic_vins_tpu.utils.prefetch import AsyncFetch

        self.prev_img = img_res
        return InstTrackHandle(AsyncFetch(packed), tuple(present),
                               eroded, use_right, use_extra)

    def track_collect(self, handle: "InstTrackHandle"):
        """Fetch + unpack a dispatched frame; host per-instance slot
        bookkeeping. Must run before the next `track_begin`."""
        cfg = self.cfg
        K, N, E = cfg.max_instances, cfg.max_dynamic_cnt, cfg.extra_max
        if handle is None or handle.packed is None:
            return {}
        present = list(handle.present)
        eroded = handle.eroded
        use_extra = handle.use_extra
        out = handle.packed.get()

        KN = K * N
        CAND = self._CAND
        sizes = [2 * KN, 2 * KN, 2 * KN, KN, KN, 2 * CAND, 2 * CAND,
                 CAND, 3 * K * E]
        p1, und, und_r, okf, okrf, cptsf, cundf, cfoundf, pwf, keepf \
            = np.split(out, np.cumsum(sizes))
        p1 = p1.reshape(K, N, 2)
        und = und.reshape(K, N, 2)
        und_r = und_r.reshape(K, N, 2)
        ok = (okf > 0.5).reshape(K, N)
        ok_r = (okrf > 0.5).reshape(K, N)
        cpts = cptsf.reshape(CAND, 2)
        cund = cundf.reshape(CAND, 2)
        cfound = cfoundf > 0.5
        pw = pwf.reshape(K, E, 3)
        keep = (keepf > 0.5).reshape(K, E)

        # ---- host bookkeeping per instance ---------------------------
        cand_used = np.zeros(CAND, bool)
        out_dict = {}
        for tid in present:
            r = self._row_of[tid]
            m_er = eroded[tid]
            okr_row = ok[r] & self._mask_ok(m_er, p1[r])
            self.pts[r] = np.where(okr_row[:, None], p1[r],
                                   self.pts[r])
            self.valid[r] = okr_row
            row_und = und[r]

            # top-up from the shared candidate pool, inside THIS mask
            need = N - int(okr_row.sum())
            if need > 0:
                avail = cfound & ~cand_used \
                    & self._mask_ok(m_er, cpts)
                cand_idx = np.flatnonzero(avail)[:need]
                free_slots = np.flatnonzero(~self.valid[r])[
                    :cand_idx.size]
                if cand_idx.size:
                    cand_used[cand_idx] = True
                    self.pts[r, free_slots] = cpts[cand_idx]
                    self.ids[r, free_slots] = self._fid_base + \
                        np.arange(cand_idx.size)
                    self._fid_base += cand_idx.size
                    self.valid[r, free_slots] = True
                    # candidate normalized coords came back in the
                    # same packed fetch
                    row_und = row_und.copy()
                    row_und[free_slots] = cund[cand_idx]

            feats = {}
            for i in np.flatnonzero(self.valid[r]):
                pl = np.array([row_und[i, 0], row_und[i, 1], 1.0])
                pr = np.array([und_r[r, i, 0], und_r[r, i, 1], 1.0]) \
                    if ok_r[r, i] else None
                feats[int(self.ids[r, i])] = (pl, pr)

            extra_world = None
            if use_extra and keep[r].any():
                extra_world = pw[r][keep[r]]
            out_dict[tid] = dict(features=feats,
                                 extra_pts_world=extra_world)
        return out_dict

    @staticmethod
    def _mask_ok(mask, pts):
        H, W = mask.shape
        xi = np.clip(pts[:, 0].astype(int), 0, W - 1)
        yi = np.clip(pts[:, 1].astype(int), 0, H - 1)
        return mask[yi, xi]
