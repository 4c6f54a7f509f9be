"""Rendered dynamic stereo scene: moving textured boxes over the static
landmark world, with exact instance masks, disparity and 3D detections.

Closes the image-domain loop for the FULL dynamic pipeline — the inputs
the reference's perception stack produces per frame (SOLOv2 instance
masks, LEAStereo disparity, FCOS3D camera-frame boxes;
`image_process.cpp:105-238`) are generated here exactly consistent with
the ground-truth ego trajectory and constant-velocity objects, so
System.process in DYNAMIC mode (masks -> MOT -> InstanceTracker ->
InstanceManager -> object BA) can be tested and benchmarked without
datasets on disk.
"""

from __future__ import annotations

from typing import List, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from dynamic_vins_tpu.geometry import lie
from dynamic_vins_tpu.io import perception
from dynamic_vins_tpu.sim import render
from dynamic_vins_tpu.sim.synthetic import SyntheticSequence


class DynamicFrame(NamedTuple):
    """Per-frame perception artifacts for System.process (DYNAMIC)."""

    img_left: np.ndarray            # [H,W] float
    img_right: np.ndarray           # [H,W] float
    seg: perception.SegResult       # instance masks (left cam)
    boxes3d: List[perception.Box3D]
    disparity: np.ndarray           # [H,W] float (0 where unknown)


class SceneObject(NamedTuple):
    track_id: int
    dims_xyz: np.ndarray            # object-frame x(len) y(wid) z(hgt)
    q_wo: np.ndarray                # world<-object (constant: rigid CV)
    gt_p: np.ndarray                # [F,3] center per frame
    tex_pts: np.ndarray             # [T,3] object-frame texture points
    tex_inten: np.ndarray           # [T]


def _make_objects(seq: SyntheticSequence, num_objects: int,
                  tex_pts: int, seed: int) -> List[SceneObject]:
    rng = np.random.default_rng(seed)
    times = np.asarray(seq.frame_times)
    F = times.shape[0]
    # objects roughly pace the ego so they stay in view (KITTI traffic)
    ego_v = (np.asarray(seq.gt_p[-1]) - np.asarray(seq.gt_p[0])) \
        / max(float(times[-1] - times[0]), 1e-6)
    objs = []
    for o in range(num_objects):
        dims = np.array([4.0, 2.0, 1.5]) * rng.uniform(0.85, 1.15)
        v_obj = ego_v + rng.uniform(-0.6, 0.6, 3) * np.array(
            [0.5, 1.0, 0.05])
        offset = np.array([8.0 + 3.5 * o, rng.uniform(-1.5, 1.5), -0.3])
        p0 = np.asarray(seq.gt_p[0]) + np.asarray(
            lie.quat_rotate(seq.gt_q[0], jnp.asarray(offset)))
        q_wo = np.asarray(seq.gt_q[0])
        gt_p = np.stack([p0 + v_obj * (times[k] - times[0])
                         for k in range(F)])
        # texture points on the box surface (biased to the faces the
        # camera sees) + a few interior fill points
        t = rng.uniform(-0.5, 0.5, size=(tex_pts, 3))
        face = rng.integers(0, 3, tex_pts)
        sign = rng.choice([-0.5, 0.5], tex_pts)
        t[np.arange(tex_pts), face] = sign
        objs.append(SceneObject(
            9 + o, dims, q_wo, gt_p, t * dims[None, :],
            rng.uniform(140.0, 255.0, tex_pts)))
    return objs


def _cam_pose(seq, k, cam):
    rig = seq.rig
    extr = (rig.p_bc, rig.q_bc) if cam == 0 else rig.right_extrinsics()
    p_wc, q_wc = lie.pose_compose(seq.gt_p[k], seq.gt_q[k],
                                  extr[0], extr[1])
    return lie.pose_inverse(p_wc, q_wc)   # p_cw, q_cw


def _box_corners_cam(center_cam, dims_lhw, R_co):
    """8 corners of a camera-frame box: dims in KITTI (l,h,w) camera
    x,y,z extents at yaw=0 (io/perception.Box3D convention)."""
    l, h, w = [float(v) for v in dims_lhw]
    sx = np.array([-1, -1, -1, -1, 1, 1, 1, 1]) * l / 2
    sy = np.array([-1, -1, 1, 1, -1, -1, 1, 1]) * h / 2
    sz = np.array([-1, 1, -1, 1, -1, 1, -1, 1]) * w / 2
    return center_cam[None, :] + (R_co @ np.stack([sx, sy, sz])).T


def make_dynamic_scene(seq: SyntheticSequence, num_objects: int = 2,
                       intensities=None, tex_pts: int = 40,
                       seed: int = 0) -> List[DynamicFrame]:
    """Render the full per-frame artifact set for every frame of `seq`.

    `seq.rig` should be a reduced-resolution rig (render.small_rig).
    Masks are the projected-box rectangles (SOLO-like amodal blobs),
    disparity is fx*baseline/z of the nearest object per pixel inside a
    mask (0 elsewhere — the instance tracker only samples inside the
    eroded masks, instance_feature.cpp:413 parity).
    """
    rig = seq.rig
    H, W = rig.height, rig.width
    F = int(np.asarray(seq.frame_times).shape[0])
    L = int(seq.landmarks.shape[0])
    inten = intensities if intensities is not None \
        else render.make_intensities(L, seed=seed)
    objs = _make_objects(seq, num_objects, tex_pts, seed)
    fx = float(rig.intr.fx)
    baseline = float(rig.baseline)

    # one jitted renderer over (static landmarks ++ object points)
    n_all = L + sum(o.tex_pts.shape[0] for o in objs)
    all_inten = jnp.concatenate(
        [jnp.asarray(inten)] + [jnp.asarray(o.tex_inten) for o in objs])

    render_j = jax.jit(
        lambda p, q, pts, c: render.render_frame(rig, p, q, pts,
                                                 all_inten, cam=c),
        static_argnums=3)

    frames = []
    for k in range(F):
        # world positions of object texture points this frame
        obj_pts_w = [np.asarray(lie.quat_rotate(
            jnp.asarray(o.q_wo)[None, :], jnp.asarray(o.tex_pts)))
            + o.gt_p[k][None, :] for o in objs]
        pts_w = jnp.concatenate(
            [seq.landmarks] + [jnp.asarray(p) for p in obj_pts_w])
        assert pts_w.shape[0] == n_all
        # uint8 like a real camera (and 4x cheaper on the tunnel H2D)
        img_l = np.asarray(render_j(seq.gt_p[k], seq.gt_q[k], pts_w,
                                    0)).astype(np.uint8)
        img_r = np.asarray(render_j(seq.gt_p[k], seq.gt_q[k], pts_w,
                                    1)).astype(np.uint8)

        # masks + boxes + disparity from the exact geometry (left cam)
        p_cw, q_cw = _cam_pose(seq, k, 0)
        masks, labels, scores, boxes3d = [], [], [], []
        depth = np.full((H, W), np.inf, np.float32)
        R_cw = np.asarray(lie.quat_to_matrix(q_cw))
        for o in objs:
            c_cam = np.asarray(lie.pose_transform_point(
                p_cw, q_cw, jnp.asarray(o.gt_p[k])))
            if c_cam[2] < 1.0:
                continue
            R_wo = np.asarray(lie.quat_to_matrix(jnp.asarray(o.q_wo)))
            R_co = R_cw @ R_wo
            # KITTI camera-frame box: x-extent=len, y=height, z=width
            # at yaw=0; our object frame is x=len, y=wid, z=hgt(up) ->
            # remap columns (obj x->cam x, obj z(up)->cam -y, obj y->z)
            R_co_kitti = np.stack(
                [R_co[:, 0], -R_co[:, 2], R_co[:, 1]], axis=1)
            dims_lhw = np.array([o.dims_xyz[0], o.dims_xyz[2],
                                 o.dims_xyz[1]])
            corners = _box_corners_cam(c_cam, dims_lhw, R_co_kitti)
            z = corners[:, 2]
            if (z <= 0.5).any():
                continue
            u = fx * corners[:, 0] / z + float(rig.intr.cx)
            v = float(rig.intr.fy) * corners[:, 1] / z \
                + float(rig.intr.cy)
            x0, x1 = int(np.floor(u.min())), int(np.ceil(u.max()))
            y0, y1 = int(np.floor(v.min())), int(np.ceil(v.max()))
            x0, y0 = max(x0, 0), max(y0, 0)
            x1, y1 = min(x1, W), min(y1, H)
            if x1 - x0 < 8 or y1 - y0 < 8:
                continue
            m = np.zeros((H, W), bool)
            m[y0:y1, x0:x1] = True
            masks.append(m)
            labels.append(2)             # COCO car
            scores.append(0.9)
            depth[y0:y1, x0:x1] = np.minimum(depth[y0:y1, x0:x1],
                                             float(c_cam[2]))
            yaw = float(np.arctan2(-R_co_kitti[2, 0], R_co_kitti[0, 0]))
            bottom = c_cam.copy()
            bottom[1] += dims_lhw[1] / 2.0
            boxes3d.append(perception.Box3D(
                "Car", 0.9, bottom, dims_lhw, yaw))

        disp = np.where(np.isfinite(depth),
                        fx * baseline / np.maximum(depth, 1e-3),
                        0.0).astype(np.float32)
        seg = perception.SegResult(
            masks=np.stack(masks) if masks else
            np.zeros((0, H, W), bool),
            scores=np.asarray(scores, np.float32),
            labels=np.asarray(labels, np.int64))
        frames.append(DynamicFrame(img_l, img_r, seg, boxes3d, disp))
    return frames, objs
