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

Tunnel-aware split API: the feature slots + validity + the previous
frame live ON DEVICE between frames, so `track_begin` needs exactly ONE
host->device transfer (the stacked image pair, in its native dtype) and
one dispatch, and `track_collect` one (async-prefetched) device->host
fetch. Host-side decisions (RANSAC-F kills) ride the next dispatch as a
tiny kill mask. `track_begin(k+1)` can therefore be dispatched BEFORE
`track_collect(k)` — the System overlaps the tracker round trip with
the backend's; `track()` is the sequential begin+collect composition.
"""

from __future__ import annotations

import contextlib
import time as _time
from dataclasses import dataclass
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from dynamic_vins_tpu.estimator.estimator import FrameFeatures
from dynamic_vins_tpu.frontend import corners, lk
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


class TrackHandle(NamedTuple):
    """In-flight frame: dispatched on device, not yet collected."""

    timestamp: float
    packed: object                # AsyncFetch pulling the packed result
    use_right: bool
    killed: object                # host kill mask this dispatch consumed


class FeatureTracker:
    def __init__(self, config: TrackerConfig,
                 intr_left: cam.PinholeIntrinsics,
                 intr_right: Optional[cam.PinholeIntrinsics] = None):
        self.cfg = config
        self.intr_left = intr_left
        self.intr_right = intr_right if intr_right is not None else \
            intr_left
        N = config.max_cnt
        # host mirrors (updated at collect time)
        self.pts = np.zeros((N, 2), np.float32)
        self.ids = np.full(N, -1, np.int64)
        self.track_cnt = np.zeros(N, np.int32)
        self.valid = np.zeros(N, bool)
        self.prev_und = np.zeros((N, 2), np.float32)
        self.prev_time = None
        self._next_id = 0
        # device residents: (prev_img_f32, pts, valid) — None until the
        # first frame
        self._dev = None
        # host kills (RANSAC-F) consumed by the next dispatch
        self._kill = np.zeros(N, bool)
        # kills not yet ridden by a dispatch: with an in-flight frame
        # (pipelined split) the next collect would otherwise resurrect
        # a confirmed epipolar outlier for one extra frame (ADVICE r4)
        self._pending_kill = np.zeros(N, bool)
        self._dummy_mask = None
        # optional sub-stage observability (the reference times every
        # frontend sub-stage, background_tracker.cpp:72,98); the System
        # shares its StageTimer so bench can attribute the frontend ms
        self.timer = None
        self._tracker = lk.make_tracker(config.levels, config.radius,
                                        config.iters, config.fb_thresh,
                                        config.border)
        self._und_left = jax.jit(
            lambda uv: cam.normalized_from_pixel(self.intr_left, uv))
        self._und_right = jax.jit(
            lambda uv: cam.normalized_from_pixel(self.intr_right, uv))

        # ---- fused per-frame step: ONE upload + ONE dispatch + ONE
        # packed fetch. On remote-attached chips each host<->device sync
        # costs a tunnel round trip (~25-80 ms measured); the unfused
        # tracker had 4-6 of them per frame, and separate left/right
        # image uploads paid the RTT twice more.
        tracker = self._tracker
        intr_l, intr_r = self.intr_left, self.intr_right
        mind, bord = config.min_dist, config.border
        fbt = config.fb_thresh
        dtype = config.dtype

        def _mask_at(mask, pts, H, W):
            xi = jnp.clip(pts[:, 0].astype(jnp.int32), 0, W - 1)
            yi = jnp.clip(pts[:, 1].astype(jnp.int32), 0, H - 1)
            return mask[yi, xi]

        def _fused(prev_img, imgs, flow, pts, valid, kill, mask,
                   use_right, use_mask, use_flow):
            # imgs: [1 or 2, H, W] native dtype (uint8 rides the tunnel
            # 4x cheaper); cast on device
            img = imgs[0].astype(dtype)
            img_r = imgs[1].astype(dtype) if use_right else img
            H, W = img.shape
            valid = valid & ~kill
            if use_flow:
                p1, ok = lk.track_by_dense_flow(flow, pts, valid,
                                                fb_thresh=fbt,
                                                border=bord)
            else:
                p1, ok = tracker(prev_img, img, pts, valid)
            ok = ok & valid
            if use_mask:
                ok = ok & _mask_at(mask, p1, H, W)
            pts_a = jnp.where(ok[:, None], p1, pts)

            cpts, cscore, cfound = corners.detect(
                img, max_corners=N, min_dist=mind, exclude_pts=pts_a,
                exclude_valid=ok, border=bord)
            if use_mask:
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
                okr = jnp.zeros(N, bool)
                und_r = und
            f = lambda a: a.astype(jnp.float32).ravel()
            packed = jnp.concatenate([
                f(pts_b), f(und), f(und_r), f(ok), f(newly), f(okr)])
            return img, pts_b, valid_b, packed

        self._variants = {}
        for ur in (False, True):
            for um in (False, True):
                for uf in (False, True):
                    self._variants[(ur, um, uf)] = jax.jit(
                        (lambda _ur, _um, _uf: lambda *a: _fused(
                            *a, _ur, _um, _uf))(ur, um, uf))
        self._cast0 = jax.jit(lambda imgs: imgs[0].astype(dtype))
        N_const = N
        self._zeros_state = jax.jit(
            lambda: (jnp.zeros((N_const, 2), dtype),
                     jnp.zeros((N_const,), bool)))

    # ------------------------------------------------------------------
    def track_begin(self, img, timestamp: float, mask=None,
                    img_right=None, flow=None,
                    imgs_dev=None) -> TrackHandle:
        """Upload + dispatch one frame; returns a handle whose results
        `track_collect` unpacks. Safe to call before collecting the
        previous handle (the in-flight frames overlap on device).

        imgs_dev: optional pre-uploaded [1|2,H,W] device stack (native
        dtype) — the System uploads ONE stack per frame and shares it
        with the instance tracker (H2D rides the tunnel at ~30 MB/s;
        a duplicate full-image upload costs ~25 ms/frame)."""
        cfg = self.cfg
        if imgs_dev is not None:
            use_right = bool(cfg.stereo and imgs_dev.shape[0] >= 2)
        else:
            use_right = bool(cfg.stereo and img_right is not None)
        with self._st("fe.upload"):
            if imgs_dev is None:
                img_np = np.asarray(img)
                if use_right:
                    stack = np.stack([img_np, np.asarray(img_right,
                                                         img_np.dtype)])
                else:
                    stack = img_np[None]
                imgs_dev = jnp.asarray(stack)

        if self._dev is None:
            prev = self._cast0(imgs_dev)
            pts_dev, valid_dev = self._zeros_state()
            first = True
        else:
            prev, pts_dev, valid_dev = self._dev
            first = False

        use_flow = flow is not None and not first
        use_mask = mask is not None
        if use_mask:
            mask_dev = jnp.asarray(mask)
        else:
            if self._dummy_mask is None:
                self._dummy_mask = jnp.zeros((1, 1), bool)
            mask_dev = self._dummy_mask
        flow_dev = jnp.asarray(flow, cfg.dtype) if use_flow \
            else jnp.zeros((1, 1, 2), cfg.dtype)

        kill_np = self._kill
        kill_dev = jnp.asarray(kill_np)
        self._kill = np.zeros(cfg.max_cnt, bool)

        fn = self._variants[(use_right, use_mask, use_flow)]
        with self._st("fe.dispatch"):
            img2, pts2, valid2, packed = fn(prev, imgs_dev, flow_dev,
                                            pts_dev, valid_dev,
                                            kill_dev, mask_dev)
            self._dev = (img2, pts2, valid2)
            from dynamic_vins_tpu.utils.prefetch import AsyncFetch
            packed = AsyncFetch(packed)
        return TrackHandle(timestamp, packed, use_right, kill_np)

    def _st(self, name: str):
        return self.timer.stage(name) if self.timer is not None \
            else contextlib.nullcontext()

    def track_collect(self, handle: TrackHandle) -> FrameFeatures:
        """Fetch + unpack a dispatched frame; host id/velocity/RANSAC
        bookkeeping. Must be called in dispatch order."""
        cfg = self.cfg
        N = cfg.max_cnt
        timestamp = handle.timestamp
        with self._st("fe.fetch"):
            out = handle.packed.get()
        _t_host0 = _time.perf_counter()
        pts_b, und, und_r, okf, newf, okrf = np.split(
            out, np.cumsum([2 * N, 2 * N, 2 * N, N, N]))
        self.pts = pts_b.reshape(N, 2).astype(np.float32)
        und = und.reshape(N, 2)
        und_r = und_r.reshape(N, 2)
        tracked = okf > 0.5
        newly = newf > 0.5
        ok_r = (okrf > 0.5)

        # kills that rode this dispatch have taken effect on device
        # (slot freed, possibly re-assigned a NEW corner); suppress the
        # rest so a RANSAC outlier is never republished while its kill
        # is still in flight behind an already-dispatched frame
        self._pending_kill &= ~handle.killed
        tracked &= ~self._pending_kill
        newly &= ~self._pending_kill

        # host bookkeeping: track counts + ids for new slots
        self.track_cnt = np.where(tracked, self.track_cnt + 1, 0)
        slots = np.flatnonzero(newly)
        self.ids[slots] = np.arange(self._next_id,
                                    self._next_id + slots.size)
        self._next_id += slots.size
        self.track_cnt[slots] = 1
        self.valid = tracked | newly

        # 2b. epipolar outlier rejection (FeatureTracker::rejectWithF);
        # kills ride the NEXT dispatch's kill mask
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
                    self._kill[bad] = True
                    self._pending_kill[bad] = True
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
        if handle.use_right:
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

        self.prev_und = und
        self.prev_time = timestamp
        if self.timer is not None:
            self.timer.totals["fe.host"] += (_time.perf_counter()
                                             - _t_host0)
            self.timer.counts["fe.host"] += 1
        return FrameFeatures(timestamp, feats)

    def track(self, img, timestamp: float, mask=None,
              img_right=None, flow=None) -> FrameFeatures:
        """Process one (grayscale [H,W]) frame synchronously.

        mask: optional [H,W] bool — True where tracking is ALLOWED
        (the reference's inv_merge_mask semantics).
        flow: optional [H,W,2] dense prev->cur flow field; when given,
        features are tracked by sampling it (use_dense_flow mode)
        instead of sparse temporal LK."""
        return self.track_collect(self.track_begin(
            img, timestamp, mask=mask, img_right=img_right, flow=flow))

    @staticmethod
    def _mask_ok(mask, pts):
        m = np.asarray(mask)
        H, W = m.shape
        xi = np.clip(pts[:, 0].astype(int), 0, W - 1)
        yi = np.clip(pts[:, 1].astype(int), 0, H - 1)
        return m[yi, xi]
