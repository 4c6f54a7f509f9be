"""System orchestration: dataset -> perception -> tracking -> estimator.

Capability parity with the reference's process entry
(`dynamic_vins/src/system/main.cpp`: Run + the ImageProcess /
FeatureTrack / ProcessMeasurements pipeline threads): builds all
components from one config, runs the frame loop across the mode matrix
(raw / naive / dynamic x mono / stereo x VO / VIO), and writes TUM ego
trajectory + per-object KITTI MOT outputs.

The reference's three pipeline threads + bounded queues become: native
prefetch loader (IO thread pool in C++) feeding a host frame loop whose
heavy stages are jitted device kernels — on TPU the pipeline overlap
comes from XLA async dispatch rather than pthreads.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field
from typing import Dict, Iterator, List, Optional

import jax.numpy as jnp
import numpy as np

from dynamic_vins_tpu.estimator.estimator import (Estimator,
                                                  EstimatorConfig,
                                                  FrameFeatures)
from dynamic_vins_tpu.frontend.instance_tracker import (
    InstanceTracker, InstanceTrackerConfig)
from dynamic_vins_tpu.frontend.tracker import (FeatureTracker,
                                               TrackerConfig)
from dynamic_vins_tpu.geometry.camera import PinholeIntrinsics
from dynamic_vins_tpu.io import perception
from dynamic_vins_tpu.io.writers import KittiMotWriter, TumWriter
from dynamic_vins_tpu.mot.tracker import MotConfig, MultiObjectTracker
from dynamic_vins_tpu.utils.config import SlamMode, VioConfig
from dynamic_vins_tpu.utils.timing import StageTimer


@dataclass
class FrameInput:
    """Everything the system may consume for one frame."""

    timestamp: float
    img_left: np.ndarray
    img_right: Optional[np.ndarray] = None
    imu: Optional[tuple] = None            # (acc [M+1,3], gyr, dt [M])
    seg: Optional[perception.SegResult] = None
    boxes3d: Optional[list] = None         # List[perception.Box3D]
    disparity: Optional[np.ndarray] = None
    dynamic_mask: Optional[np.ndarray] = None  # True = dynamic pixel
    flow: Optional[np.ndarray] = None          # [H,W,2] prev->cur flow


class System:
    def __init__(self, cfg: VioConfig, output_prefix: str = "output/run"):
        self.cfg = cfg
        self.timer = StageTimer()

        intr_vals = cfg.intrinsics_left or [460.0, 460.0, cfg.image_width
                                            / 2, cfg.image_height / 2]
        intr = PinholeIntrinsics.make(*intr_vals[:4],
                                      *(intr_vals[4:8] or []),
                                      dtype=jnp.float32)
        intr_r_vals = cfg.intrinsics_right or intr_vals
        intr_r = PinholeIntrinsics.make(*intr_r_vals[:4],
                                        *(intr_r_vals[4:8] or []),
                                        dtype=jnp.float32)
        self.intr = intr
        self.intr_r = intr_r

        p_bc, q_bc = cfg.extrinsics()
        self.baseline = float(np.linalg.norm(p_bc[1] - p_bc[0])) or 0.1

        self.tracker = FeatureTracker(
            TrackerConfig(max_cnt=cfg.max_cnt, min_dist=cfg.min_dist,
                          stereo=cfg.is_stereo), intr, intr_r)
        self.tracker.timer = self.timer    # fe.* sub-stage breakdown
        # LinePoint mode (reference: TrackImageLine/TrackSemanticImage
        # spawn the line-detection thread, background_tracker.cpp:198,
        # 775-780; here the LSD tracker runs in the frontend stage and
        # its normalized endpoints ride FrameFeatures.lines)
        self.line_tracker = None
        if cfg.use_line:
            from dynamic_vins_tpu.frontend.line_tracker import (
                LineTracker, LineTrackerConfig)
            self.line_tracker = LineTracker(LineTrackerConfig())
        # distributed engine mode (north star): the estimator's fused
        # solve dispatches through the shard_map solver over this mesh
        self.mesh = None
        if cfg.devices and cfg.devices > 1:
            import jax
            from jax.sharding import Mesh

            devs = jax.devices()
            if len(devs) < cfg.devices:
                raise RuntimeError(
                    f"devices={cfg.devices} but only {len(devs)} "
                    "available (CPU: set XLA_FLAGS="
                    "--xla_force_host_platform_device_count=N before "
                    "the first jax use)")
            self.mesh = Mesh(np.array(devs[:cfg.devices]), ("lm",))

        # obs capacity sized to the config (reference relationship:
        # kMaxCnt x window x stereo; the solver's device time scales
        # with the STATIC capacity — 13.5 ms/10iter at 4096 rows vs
        # 27 ms at 8192 measured — so a fixed 8192 wastes half the
        # solve for max_cnt=150)
        obs_cap = 1024
        while obs_cap < cfg.max_cnt * cfg.num_frames * 2:
            obs_cap *= 2
        self.estimator = Estimator(
            EstimatorConfig(num_frames=cfg.num_frames,
                            obs_capacity=obs_cap,
                            stereo=cfg.is_stereo, use_imu=cfg.use_imu,
                            pipelined=cfg.pipelined,
                            max_iters=cfg.max_solver_iterations,
                            estimate_extrinsic=cfg.estimate_extrinsic,
                            estimate_td=cfg.estimate_td,
                            use_plane_constraint=cfg.use_plane_constraint,
                            use_line=cfg.use_line,
                            line_weight=cfg.line_weight,
                            mesh=self.mesh,
                            dynamic=cfg.slam == SlamMode.DYNAMIC),
            p_bc, q_bc)

        # ---- online perception stages (models/ package) --------------
        # The reference's ImageProcessor launches det2d/det3d/stereo per
        # frame (image_process.cpp:149-162); offline artifacts arrive
        # via FrameInput, online nets are instantiated here.
        hw = (cfg.image_height, cfg.image_width)
        self.det2d = self.det3d = self.stereo_net = self.flow_net = None
        self._reid = None
        if cfg.det2d_online and cfg.slam != SlamMode.RAW:
            from dynamic_vins_tpu.models import OnlineDetector2D
            self.det2d = OnlineDetector2D(
                hw, score_thresh=cfg.det2d_score_thresh,
                params_path=cfg.det2d_weights)
        if cfg.det3d_online and cfg.slam == SlamMode.DYNAMIC:
            from dynamic_vins_tpu.models import OnlineDetector3D
            self.det3d = OnlineDetector3D(
                hw, intr_vals[:4], params_path=cfg.det3d_weights)
        if cfg.stereo_online and cfg.is_stereo:
            from dynamic_vins_tpu.models import OnlineStereoMatcher
            self.stereo_net = OnlineStereoMatcher(
                hw, params_path=cfg.stereo_weights)
        if cfg.use_dense_flow:
            from dynamic_vins_tpu.models import OnlineFlowEstimator
            self.flow_net = OnlineFlowEstimator(
                hw, params_path=cfg.flow_weights)
            self._prev_img = None
        if cfg.use_reid:
            from dynamic_vins_tpu.models import ReidExtractor
            self._reid = ReidExtractor(params_path=cfg.reid_weights)

        # loop closure (keyframe db -> loop edges -> pose graph; the
        # north-star distributed-PGO phase's data source)
        self.loop_closer = None
        if cfg.use_loop_closure:
            from dynamic_vins_tpu.loop import (LoopCloser,
                                               LoopClosureConfig)
            self.loop_closer = LoopCloser(
                LoopClosureConfig(min_gap=cfg.loop_min_gap,
                                  prox_radius=cfg.loop_prox_radius),
                intr, p_bc[0], q_bc[0], baseline=self.baseline)

        self.mot = None
        self.inst_tracker = None
        if cfg.slam == SlamMode.DYNAMIC:
            self.mot = MultiObjectTracker(
                MotConfig(n_init=cfg.mot_n_init, max_age=cfg.mot_max_age),
                embed_fn=self._reid)
            self.inst_tracker = InstanceTracker(
                InstanceTrackerConfig(
                    max_dynamic_cnt=cfg.max_dynamic_cnt,
                    min_dynamic_dist=cfg.min_dynamic_dist),
                intr, self.baseline, p_bc[0], q_bc[0])

        os.makedirs(os.path.dirname(output_prefix) or ".", exist_ok=True)
        self.tum_writer = TumWriter(output_prefix + "_ego_tum.txt")
        self.mot_writer = KittiMotWriter(output_prefix + "_mot.txt") \
            if cfg.slam == SlamMode.DYNAMIC else None
        self.frame_idx = 0
        self._tid_remap: Dict[int, int] = {}
        self._last_dets: Dict[int, dict] = {}
        # pipelined frontend (tunnel-aware): dispatch the fused tracker
        # (and, in DYNAMIC mode, the fused instance tracker) for frame
        # k, collect frame k-1 — the trackers' device round trips
        # overlap the backend's in-flight solve. The reference gets the
        # same overlap from its FeatureTrack/ProcessMeasurements
        # threads (main.cpp:394-404).
        self._fe_pending: List[dict] = []
        self._use_async_fe = bool(cfg.pipelined)
        # frontend frames in flight (see process(); the instance
        # tracker always runs at lag 1 inside this window)
        self._fe_lag = 2
        # recent frames buffered for loop keyframing: the pipelined
        # estimator's output lags the input by up to 2 frames, so the
        # keyframe image must be the one whose timestamp matches the
        # output pose, not the frame being fed in (ADVICE r4)
        self._loop_fi_buf: Dict[float, tuple] = {}

    # ------------------------------------------------------------------
    def process(self, fi: FrameInput):
        cfg = self.cfg
        t = self.timer

        if self._use_async_fe:
            with t.stage("perception"):
                self._run_perception_nets(fi)
                masks_by_tid, background_mask = self._perception(fi)
            # keep the tracker's jit variant stable in masked modes: a
            # frame with no instances would flip use_mask and trigger a
            # recompile/cache-load mid-sequence (~500 ms one-off)
            if cfg.slam != SlamMode.RAW and background_mask is None:
                background_mask = self._all_true_mask(fi.img_left.shape)
            # ONE image upload per frame, shared by the feature tracker
            # and (dynamic mode) the instance tracker — a duplicate
            # full-image H2D costs ~25 ms through the ~30 MB/s tunnel
            imgs_dev = None
            if self.inst_tracker is not None:
                img_np = np.asarray(fi.img_left)
                if cfg.is_stereo and fi.img_right is not None:
                    stack = np.stack([img_np, np.asarray(
                        fi.img_right, img_np.dtype)])
                else:
                    stack = img_np[None]
                imgs_dev = jnp.asarray(stack)
            with t.stage("frontend"):
                h = self.tracker.track_begin(
                    fi.img_left, fi.timestamp, mask=background_mask,
                    img_right=fi.img_right, flow=self.last_flow,
                    imgs_dev=imgs_dev)
                lines = None
                if self.line_tracker is not None:
                    with t.stage("fe.lsd"):
                        segs, right = self.line_tracker.track(
                            np.asarray(fi.img_left),
                            mask=background_mask,
                            img_right=(np.asarray(fi.img_right)
                                       if fi.img_right is not None
                                       else None))
                        lines = self._lines_to_obs(segs, right)
            # finish the oldest in-flight frame FIRST (its instance
            # results were collected last frame): the backend dispatch
            # then overlaps this frame's instance collect below.
            # Frontend depth 2: a handle's dispatch->device->fetch
            # round trip through the tunnel is ~1.5 frames; at depth 1
            # every collect still waits ~a round trip (measured
            # fe.fetch 29 ms), at depth 2 the result has landed.
            out = None
            if len(self._fe_pending) > self._fe_lag - 1:
                out = self._finish_oldest_pending()
            # instance pipeline: collect(k-1) BEFORE begin(k) — the
            # instance tracker's host slot state feeds its next
            # dispatch, so it runs at lag 1 regardless of the frontend
            # depth; the collected dicts are buffered on the entry.
            # Running this AFTER the backend dispatch gives the k-1
            # handle a full frame in flight (it was ~0.7 frames old
            # when collected up front — a ~14 ms residual wait).
            h_inst = None
            if self.inst_tracker is not None:
                with t.stage("instances"):
                    if self._fe_pending:
                        last = self._fe_pending[-1]
                        if last["h_inst"] is not None:
                            last["instances"] = self._collect_instances(
                                last["h_inst"], last["masks"])
                            last["h_inst"] = None
                    if masks_by_tid:
                        ego = self._ego_estimate()
                        h_inst = self.inst_tracker.track_begin(
                            fi.img_left,
                            {tid: m for tid, (m, _)
                             in masks_by_tid.items()},
                            img_right=fi.img_right,
                            disparity=fi.disparity, ego_pose=ego,
                            imgs_dev=imgs_dev)
            self._fe_pending.append(dict(
                h=h, fi=fi, lines=lines, h_inst=h_inst,
                masks=masks_by_tid, instances=None))
            return out

        # ---- perception: build masks / instances ----------------------

        # ---- perception: build masks / instances ----------------------
        with t.stage("perception"):
            self._run_perception_nets(fi)
            masks_by_tid, background_mask = self._perception(fi)

        # ---- background tracking --------------------------------------
        with t.stage("frontend"):
            feats = self.tracker.track(fi.img_left, fi.timestamp,
                                       mask=background_mask,
                                       img_right=fi.img_right,
                                       flow=self.last_flow)
            if self.line_tracker is not None:
                segs, right = self.line_tracker.track(
                    np.asarray(fi.img_left), mask=background_mask,
                    img_right=(np.asarray(fi.img_right)
                               if fi.img_right is not None else None))
                feats = feats._replace(
                    lines=self._lines_to_obs(segs, right))

        # ---- instance tracking ----------------------------------------
        instances = None
        if self.inst_tracker is not None and masks_by_tid:
            with t.stage("instances"):
                h_inst = self.inst_tracker.track_begin(
                    fi.img_left, {tid: m for tid, (m, _) in
                                  masks_by_tid.items()},
                    img_right=fi.img_right, disparity=fi.disparity,
                    ego_pose=self._ego_estimate())
                instances = self._collect_instances(h_inst,
                                                    masks_by_tid)

        return self._finish_frame(fi, feats, instances)

    # ------------------------------------------------------------------
    def _all_true_mask(self, shape):
        if getattr(self, "_ones_mask", None) is None \
                or self._ones_mask.shape != shape:
            self._ones_mask = np.ones(shape, bool)
        return self._ones_mask

    # ------------------------------------------------------------------
    def _ego_estimate(self):
        """Latest ego pose for the instance tracker's world transform
        (lagged by the pipeline depth in async mode — the reference's
        one-frame-lagged backend->frontend feedback)."""
        fc = self.estimator.frame_count
        if fc:
            return (self.estimator.state.p[fc - 1],
                    self.estimator.state.q[fc - 1])
        return np.zeros(3), np.array([1.0, 0, 0, 0])

    def _collect_instances(self, h_inst, masks_by_tid):
        """Collect an in-flight instance dispatch and merge the frame's
        detections (cls / dims_det / q_det) into the push_frame dicts."""
        tracked = self.inst_tracker.track_collect(h_inst)
        instances = {}
        for tid, data in tracked.items():
            _, det = masks_by_tid[tid]
            data = dict(data)
            data["cls"] = det.get("cls", 0)
            data["features"] = {f: (pl, pr) for f, (pl, pr)
                                in data["features"].items()}
            if det.get("dims_det") is not None:
                data["dims_det"] = det["dims_det"]
            if det.get("q_det") is not None:
                data["q_det"] = det["q_det"]
            instances[tid] = data
        return instances

    # ------------------------------------------------------------------
    def reset_timers(self):
        """Fresh StageTimer shared by System + tracker (bench uses this
        to restrict stage means to the steady state)."""
        self.timer = StageTimer()
        self.tracker.timer = self.timer
        return self.timer

    # ------------------------------------------------------------------
    def _run_perception_nets(self, fi: FrameInput):
        """Online perception stages (offline artifacts pass through)."""
        if self.det2d is not None and fi.seg is None:
            fi.seg = self.det2d(fi.img_left)
        if self.det3d is not None and not fi.boxes3d:
            fi.boxes3d = self.det3d(fi.img_left)
        if (self.stereo_net is not None and fi.disparity is None
                and fi.img_right is not None):
            fi.disparity = self.stereo_net(fi.img_left,
                                           fi.img_right)
        if fi.flow is not None:
            self.last_flow = fi.flow          # offline artifact
        elif self.flow_net is not None:
            self.last_flow = self.flow_net(self._prev_img,
                                           fi.img_left) \
                if self._prev_img is not None else None
            self._prev_img = fi.img_left
        else:
            self.last_flow = None

    def _finish_frame(self, fi: FrameInput, feats, instances):
        """Backend + loop closure + output for one (possibly lagged)
        frame's collected frontend features."""
        cfg = self.cfg
        t = self.timer
        with t.stage("backend"):
            out = self.estimator.process_frame(feats, fi.imu,
                                               instances=instances)

        # ---- loop closure (off the critical path: strided keyframes) --
        drained = []
        if self.loop_closer is not None:
            self._loop_fi_buf[fi.timestamp] = (
                fi.img_left, fi.disparity, self.frame_idx)
            while len(self._loop_fi_buf) > 8:
                self._loop_fi_buf.pop(next(iter(self._loop_fi_buf)))
        kf = self._loop_fi_buf.pop(out.timestamp, None) \
            if (self.loop_closer is not None and out is not None) \
            else None
        if kf is not None and kf[2] % cfg.loop_keyframe_stride == 0:
            kf_img, kf_disp, kf_idx = kf
            with t.stage("loop"):
                edge = self.loop_closer.add_keyframe(
                    kf_img, out.timestamp, out.p, out.q,
                    disparity=kf_disp, frame_idx=kf_idx)
                if edge is not None and cfg.loop_live_correction:
                    # live relocalization: solve the pose graph and
                    # re-anchor the running window so post-loop
                    # odometry is drift-corrected (VERDICT r3 #6)
                    res = self.loop_closer.optimize()
                    if res is not None:
                        p_g, q_g, _ = res
                        kf = self.loop_closer.db.keyframes[edge.j]
                        drained = self.estimator.apply_loop_correction(
                            kf.p, kf.q, p_g[edge.j], q_g[edge.j])
                        self.loop_closer.rebase(p_g, q_g)

        # ---- output ----------------------------------------------------
        with t.stage("output"):
            if out is not None:
                self.tum_writer.write(out.timestamp, out.p, out.q)
            for o in drained:          # pipelined frames flushed by the
                self.tum_writer.write(o.timestamp, o.p, o.q)  # correction
            if self.mot_writer is not None:
                self._write_mot(fi)
        self.frame_idx += 1
        return out

    # ------------------------------------------------------------------
    def _perception(self, fi: FrameInput):
        """Instance masks + background mask (ImageProcessor::Run +
        SemanticImage::SetMaskAndRoi parity)."""
        cfg = self.cfg
        H, W = fi.img_left.shape
        if cfg.slam == SlamMode.RAW:
            return {}, None

        if cfg.slam == SlamMode.NAIVE:
            # mask-gated rejection only: dynamic pixels excluded
            if fi.dynamic_mask is not None:
                return {}, ~fi.dynamic_mask
            if fi.seg is not None and len(fi.seg.masks):
                merged = perception.merge_masks(fi.seg.masks, (H, W))
                return {}, ~merged
            return {}, None

        # DYNAMIC: segment instances + MOT association
        masks_by_tid = {}
        merged = np.zeros((H, W), bool)
        if fi.seg is not None and len(fi.seg.masks):
            keep = [i for i, l in enumerate(fi.seg.labels)
                    if int(l) in perception.COCO_DYNAMIC_IDS]
            masks = fi.seg.masks[keep]
            labels = fi.seg.labels[keep]
            boxes2d = perception.masks_to_boxes2d(masks)
            assign = self.mot.update(boxes2d, classes=labels,
                                     img=fi.img_left) \
                if len(boxes2d) else {}
            # associate 2D <-> 3D boxes (BoxAssociate2Dto3D)
            used3d: set = set()
            for det_i, tid in assign.items():
                det = dict(cls=int(labels[det_i]), bbox=boxes2d[det_i])
                if fi.boxes3d:
                    b3 = self._match_box3d(boxes2d[det_i], fi.boxes3d,
                                           cls=int(labels[det_i]),
                                           used=used3d)
                    if b3 is not None:
                        det["dims_det"] = b3.dims
                        det["q_det"] = self._qdet_world(b3)
                        det["box3d"] = b3
                masks_by_tid[tid] = (masks[det_i], det)
                merged |= masks[det_i]
        background = ~merged if masks_by_tid else None
        self._last_dets = {tid: det for tid, (_, det)
                           in masks_by_tid.items()}
        return masks_by_tid, background

    def _lines_to_obs(self, segs, right):
        """Pixel line segments -> {id: (s_l, e_l, s_r|None, e_r|None)}
        with normalized z=1 endpoints (the estimator's line format)."""
        from dynamic_vins_tpu.geometry import camera as cam
        if not segs:
            return {}
        uv = np.array([[[s.sx, s.sy], [s.ex, s.ey]] for s in segs],
                      np.float32).reshape(-1, 2)
        n = np.asarray(cam.normalized_from_pixel(
            self.intr, jnp.asarray(uv))).reshape(len(segs), 2, 2)
        n_r = {}
        if right:
            r_ids = list(right.keys())
            uv_r = np.array(
                [[[right[i].sx, right[i].sy], [right[i].ex, right[i].ey]]
                 for i in r_ids], np.float32).reshape(-1, 2)
            nr = np.asarray(cam.normalized_from_pixel(
                self.intr_r, jnp.asarray(uv_r))).reshape(len(r_ids), 2, 2)
            n_r = {i: nr[k] for k, i in enumerate(r_ids)}
        obs = {}
        for k, seg in enumerate(segs):
            sl = np.append(n[k, 0], 1.0)
            el = np.append(n[k, 1], 1.0)
            if seg.id in n_r:
                sr = np.append(n_r[seg.id][0], 1.0)
                er = np.append(n_r[seg.id][1], 1.0)
            else:
                sr = er = None
            obs[seg.id] = (sl, el, sr, er)
        return obs

    def _project_box3d_bbox(self, bottom_center, dims, R_co):
        """Project the 8 corners of a camera-frame 3D box to pixels ->
        (x1, y1, x2, y2) or None if the box is behind the camera."""
        dx, dy, dz = [float(v) for v in dims]
        sx = np.array([-1, -1, -1, -1, 1, 1, 1, 1]) * dx / 2
        sy = np.array([0, 0, -1, -1, 0, 0, -1, -1]) * dy  # bottom->top
        sz = np.array([-1, 1, -1, 1, -1, 1, -1, 1]) * dz / 2
        corners = np.asarray(bottom_center)[None, :] + \
            (np.asarray(R_co) @ np.stack([sx, sy, sz]).astype(float)).T
        z = corners[:, 2]
        if (z <= 0.1).any():
            return None
        fx, fy = float(self.intr.fx), float(self.intr.fy)
        cx0, cy0 = float(self.intr.cx), float(self.intr.cy)
        u = fx * corners[:, 0] / z + cx0
        v = fy * corners[:, 1] / z + cy0
        return (float(u.min()), float(v.min()),
                float(u.max()), float(v.max()))

    def _match_box3d(self, bbox2d, boxes3d, cls=None,
                     iou_thresh: float = 0.1, used=None):
        """Best 3D detection by IoU of the projected 3D box with the 2D
        detection bbox, gated by exact class match, each 3D box consumed
        at most once (the reference's BoxAssociate2Dto3D,
        image_process.cpp:28-61: IoU > 0.1 of Box3D::ProjectCorners +
        same category + match_vec consumption)."""
        from dynamic_vins_tpu.mot.tracker import iou

        want = perception.COCO_TO_KITTI.get(cls) if cls is not None \
            else None
        best, best_i, best_iou = None, None, iou_thresh
        for bi, b in enumerate(boxes3d):
            if used is not None and bi in used:
                continue
            if want is not None and b.class_name != want:
                continue
            proj = self._project_box3d_bbox(b.bottom_center, b.dims,
                                            b.rotation_matrix())
            if proj is None:
                continue
            i = iou(np.asarray(bbox2d, float), np.asarray(proj))
            if i > best_iou:
                best, best_i, best_iou = b, bi, i
        if best is not None and used is not None:
            used.add(best_i)
        return best

    def _qdet_world(self, box3d):
        """Camera-frame detected orientation -> world, using the current
        ego estimate. Host numpy math: per-frame eager jnp quaternion
        ops each cost a dispatch (and a tunnel round trip on the
        remote-attached chip — 30 ms/frame measured in this stage)."""
        from dynamic_vins_tpu.geometry import lie_np

        st = self.estimator.state
        k = max(self.estimator.frame_count - 1, 0)
        q_co = lie_np.matrix_to_quat(np.asarray(box3d.rotation_matrix()))
        p_wc, q_wc = lie_np.pose_compose(
            np.asarray(st.p[k], float), np.asarray(st.q[k], float),
            np.asarray(st.p_bc[0], float), np.asarray(st.q_bc[0], float))
        return lie_np.quat_multiply(q_wc, q_co)

    def _write_mot(self, fi: FrameInput):
        """One KITTI-tracking line per instance. The reference writes
        the frontend 2D box into every MOT line (output.cpp:426,448 —
        the devkit associates GT<->est by 2D IoU); when an instance has
        no detection this frame, the projected estimated 3D box stands
        in (the commented corner2d block at output.cpp:496-518)."""
        states = self.estimator.get_instance_states()
        # host numpy lie math: eager jnp ops here cost one tunnel round
        # trip EACH (205 ms/frame measured in the output stage)
        from dynamic_vins_tpu.geometry import lie_np

        st = self.estimator.state
        k = max(self.estimator.frame_count - 1, 0)
        p_wc, q_wc = lie_np.pose_compose(
            np.asarray(st.p[k], float), np.asarray(st.q[k], float),
            np.asarray(st.p_bc[0], float), np.asarray(st.q_bc[0], float))
        p_cw, q_cw = lie_np.pose_inverse(p_wc, q_wc)
        H, W = fi.img_left.shape

        for tid in sorted(set(states) | set(self._last_dets)):
            s = states.get(tid)
            det = self._last_dets.get(tid)
            cls_coco = s["cls"] if s is not None else det["cls"]
            kitti_cls = perception.COCO_TO_KITTI.get(cls_coco, "Car")

            if s is not None:
                p_cam = lie_np.pose_transform_point(
                    p_cw, q_cw, np.asarray(s["p"], float))
                # camera-frame yaw of the object (about -y)
                q_obj_cam = lie_np.quat_multiply(
                    q_cw, np.asarray(s["q"], float))
                R_co = lie_np.quat_to_matrix(q_obj_cam)
                yaw = float(np.arctan2(-R_co[2, 0], R_co[0, 0]))
                dims = np.asarray(s["dims"], float)
                bottom = p_cam.copy()
                bottom[1] += dims[2] / 2.0
                hwl = (dims[2], dims[1], dims[0])
            elif det is not None and det.get("box3d") is not None:
                b3 = det["box3d"]
                bottom = np.asarray(b3.bottom_center, float)
                # Box3D.dims is (l, h, w) camera x,y,z extents
                # (io/perception.py:106) -> KITTI h, w, l order
                hwl = (float(b3.dims[1]), float(b3.dims[2]),
                       float(b3.dims[0]))
                yaw = float(b3.yaw)
                R_co = b3.rotation_matrix()
                dims = None
            else:
                bottom = np.zeros(3)
                hwl = (1.5, 1.8, 4.0)     # reference default dims
                yaw = 0.0
                R_co = dims = None

            if det is not None:
                bbox = tuple(float(v) for v in det["bbox"])
            elif dims is not None:
                # project the estimated box (dims are object-frame
                # x/y/z extents; camera-frame box via R_co)
                bbox = self._project_box3d_bbox(
                    bottom, (dims[0], dims[2], dims[1]), R_co)
                if bbox is None:
                    continue          # behind the camera: unevaluable
                bbox = (max(bbox[0], 0.0), max(bbox[1], 0.0),
                        min(bbox[2], W - 1.0), min(bbox[3], H - 1.0))
                if bbox[2] <= bbox[0] or bbox[3] <= bbox[1]:
                    continue
            else:
                continue

            self.mot_writer.write(
                self.frame_idx, tid, kitti_cls, bbox, hwl,
                bottom, yaw, score=1.0)

    def _finish_oldest_pending(self):
        """Collect + finish the oldest in-flight frontend frame."""
        e = self._fe_pending.pop(0)
        if self.inst_tracker is not None and e["h_inst"] is not None:
            # in-order instance collect (normally done at lag 1 in
            # process(); this path covers drains)
            e["instances"] = self._collect_instances(e["h_inst"],
                                                     e["masks"])
            e["h_inst"] = None
        with self.timer.stage("frontend"):
            feats = self.tracker.track_collect(e["h"])
            if e["lines"] is not None:
                feats = feats._replace(lines=e["lines"])
        # MOT rows for the lagged frame use ITS detections
        self._last_dets = {tid: det for tid, (_, det)
                           in e["masks"].items()}
        return self._finish_frame(e["fi"], feats, e["instances"])

    def drain(self):
        """Collect + finish every in-flight frame (pipelined frontend
        AND pipelined estimator); returns their OdometryOut list. The
        outputs are also written to the TUM/MOT files as usual."""
        outs = []
        while self._fe_pending:
            out = self._finish_oldest_pending()
            if out is not None:
                outs.append(out)
        for out in self.estimator.flush():
            self.tum_writer.write(out.timestamp, out.p, out.q)
            outs.append(out)
        return outs

    def close(self):
        # drain in-flight pipelined frames first
        self.drain()
        self.tum_writer.close()
        if self.mot_writer:
            self.mot_writer.close()
        # loop-corrected keyframe trajectory alongside the raw VIO one
        if self.loop_closer is not None and self.loop_closer.edges:
            # engine mesh mode: the PGO runs as a distributed solve too
            pgo_mesh = None
            if self.mesh is not None:
                from jax.sharding import Mesh as _Mesh
                pgo_mesh = _Mesh(self.mesh.devices, ("edge",))
            out = self.loop_closer.optimize(mesh=pgo_mesh)
            if out is not None:
                p, q, _ = out
                path = self.tum_writer._f.name.replace(
                    "_ego_tum.txt", "_ego_tum_loop.txt")
                with TumWriter(path) as w:
                    for k, kf in enumerate(
                            self.loop_closer.db.keyframes):
                        w.write(kf.timestamp, p[k], q[k])
        return self.timer.summary()
