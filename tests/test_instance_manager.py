"""Instance manager: full per-object pipeline on a simulated moving box."""

import jax.numpy as jnp
import numpy as np
import pytest

from dynamic_vins_tpu.estimator import box_fit
from dynamic_vins_tpu.estimator.instance_manager import (InstanceConfig,
                                                         InstanceManager)
from dynamic_vins_tpu.geometry import lie
from dynamic_vins_tpu.sim import synthetic as sim


def test_box_fit_ransac(rng):
    dims = jnp.asarray([4.0, 2.0, 1.5])
    center = jnp.asarray([3.0, -1.0, 0.5])
    pts = rng.uniform(-0.5, 0.5, size=(100, 3)) * np.asarray(dims)
    pts = jnp.asarray(pts) + center
    # add outliers
    outliers = jnp.asarray(rng.uniform(-20, 20, size=(20, 3)))
    all_pts = jnp.concatenate([pts, outliers])
    valid = jnp.ones(120, bool)
    q = lie.quat_identity(jnp.float64)
    c, cnt, mask = box_fit.fit_box_center(all_pts, valid, q, dims)
    assert int(cnt) >= 80
    np.testing.assert_allclose(np.asarray(c), np.asarray(center),
                               atol=0.5)


def test_radius_filter_and_cluster(rng):
    cluster = rng.normal(scale=0.3, size=(50, 3))
    stragglers = rng.normal(scale=0.3, size=(5, 3)) + 10.0
    pts = jnp.asarray(np.concatenate([cluster, stragglers]))
    valid = jnp.ones(55, bool)
    kept = box_fit.radius_filter(pts, valid, radius=1.0,
                                 min_neighbors=3)
    assert np.asarray(kept)[:50].all()
    keep2 = box_fit.largest_cluster(pts, valid, radius=1.0)
    assert np.asarray(keep2)[:50].all()
    assert not np.asarray(keep2)[50:].any()


def _simulate_object_sequence(F=8, n_pts=24, seed=0):
    rng = np.random.default_rng(seed)
    seq = sim.generate_sequence(num_frames=F, num_landmarks=4, seed=1)
    rig = seq.rig
    times = np.asarray(seq.frame_times)
    dims = np.array([4.0, 2.0, 1.5])
    v_obj = np.array([-0.8, 2.0, 0.0])
    p0 = np.asarray(seq.gt_p[0]) + np.asarray(
        lie.quat_rotate(seq.gt_q[0], jnp.asarray([8.0, 0.0, -0.5])))
    q0 = np.asarray(seq.gt_q[0])
    pts_obj = rng.uniform(-0.5, 0.5, size=(n_pts, 3)) * dims[None, :]
    pts_obj -= pts_obj.mean(0, keepdims=True)

    extr = [(np.asarray(rig.p_bc), np.asarray(rig.q_bc)),
            tuple(np.asarray(x) for x in rig.right_extrinsics())]

    frames = []
    gt_p = []
    for k in range(F):
        p_wo = p0 + v_obj * (times[k] - times[0])
        gt_p.append(p_wo)
        feats = {}
        extra = []
        for l in range(n_pts):
            pw = np.asarray(lie.quat_rotate(
                jnp.asarray(q0), jnp.asarray(pts_obj[l]))) + p_wo
            obs = []
            for c in range(2):
                p_wc, q_wc = lie.pose_compose(
                    seq.gt_p[k], seq.gt_q[k],
                    jnp.asarray(extr[c][0]), jnp.asarray(extr[c][1]))
                p_cw, q_cw = lie.pose_inverse(p_wc, q_wc)
                pc = np.asarray(lie.pose_transform_point(p_cw, q_cw,
                                                         jnp.asarray(pw)))
                obs.append(pc[:2] / pc[2] if pc[2] > 0.5 else None)
            if obs[0] is not None:
                pl = np.append(obs[0], 1.0)
                pr = np.append(obs[1], 1.0) if obs[1] is not None else None
                feats[l] = (pl, pr)
                extra.append(pw + rng.normal(scale=0.02, size=3))
        frames.append({
            7: dict(cls=1, features=feats,
                    extra_pts_world=np.asarray(extra),
                    dims_det=dims, q_det=q0)})
    return seq, frames, np.asarray(gt_p), v_obj, dims, extr, times


def test_instance_pipeline_tracks_moving_object():
    seq, frames, gt_p, v_obj, dims, extr, times = \
        _simulate_object_sequence()
    F = 8
    cfg = InstanceConfig(num_frames=F, max_objects=4, lm_per_object=32,
                         obs_per_object=512)
    im = InstanceManager(cfg)

    # ego camera world->cam per frame/cam (ground truth ego)
    p_cw = np.zeros((F, 2, 3))
    q_cw = np.zeros((F, 2, 4))
    for k in range(F):
        for c in range(2):
            p_wc, q_wc = lie.pose_compose(
                seq.gt_p[k], seq.gt_q[k],
                jnp.asarray(extr[c][0]), jnp.asarray(extr[c][1]))
            pc, qc = lie.pose_inverse(p_wc, q_wc)
            p_cw[k, c] = np.asarray(pc)
            q_cw[k, c] = np.asarray(qc)

    for k in range(F):
        im.push_frame(k, frames[k], np.asarray(seq.gt_p[k]),
                      np.asarray(seq.gt_q[k]), extr[0][0], extr[0][1])
        im.propagate_pose(k, times)
        im.initialize_instances(k)
        im.triangulate(k, np.asarray(seq.gt_p[k]),
                       np.asarray(seq.gt_q[k]), extr[0][0], extr[0][1],
                       extr[1])
        im.init_velocity(k, times)
        im.classify_motion(k, times)
    im.optimize(times, p_cw, q_cw)

    # end-of-run reader: block for the final in-flight solve
    out = im.output(sync=True)
    assert 7 in out
    o = out[7]
    assert not o["is_static"]
    # velocity recovered
    np.testing.assert_allclose(o["v"], v_obj, atol=0.3)
    # final-frame position close to gt (modulo centroid gauge)
    assert np.linalg.norm(o["p"] - gt_p[-1]) < 0.4
    np.testing.assert_allclose(o["dims"], dims, atol=0.3)


def test_slide_window_new_moves_newest_into_second_newest():
    """Instance::SlideWindowNew parity: on a non-keyframe margin the
    second-newest frame's object data is dropped and the newest moves
    into its slot, tracking the ego window's identical move."""
    cfg = InstanceConfig(num_frames=5, max_objects=2)
    im = InstanceManager(cfg)
    s = im._alloc(7, cls=2)
    F = cfg.num_frames
    im.active[s] = True
    im.frame_valid[s, :] = True
    for k in range(F):
        im.p[s, k] = [float(k), 0.0, 0.0]
    im.lm_valid[s, 0] = True
    im.lm_feat_id[s, 0] = 11
    im.obs_valid[s, F - 1, 0, 0] = True      # obs only at newest
    im.obs[s, F - 1, 0, 0] = [0.3, 0.4]
    # a second landmark observed ONLY at the dropped frame F-2
    im.lm_valid[s, 1] = True
    im.lm_feat_id[s, 1] = 12
    im.obs_valid[s, F - 2, 1, 0] = True

    im._p_cw = np.zeros((F, 2, 3))           # stale capture
    im._q_cw = np.tile([1.0, 0, 0, 0], (F, 2, 1))
    im.slide_window_new()

    # newest slot's pose/obs moved into F-2; F-1 cleared
    np.testing.assert_allclose(im.p[s, F - 2], [F - 1.0, 0, 0])
    assert im.obs_valid[s, F - 2, 0, 0]
    np.testing.assert_allclose(im.obs[s, F - 2, 0, 0], [0.3, 0.4])
    assert not im.obs_valid[s, F - 1].any()
    assert not im.frame_valid[s, F - 1]
    # landmark observed only at the dropped frame is culled
    assert not im.lm_valid[s, 1]
    assert im.lm_feat_id[s, 1] == -1
    assert im.lm_valid[s, 0]
    # stale ego-pose capture invalidated: no-arg reject is a no-op
    assert im._p_cw is None
    im.reject_outliers()
    assert im.lm_valid[s, 0]


def test_instance_lifecycle_lost_deletion():
    cfg = InstanceConfig(num_frames=6, max_objects=2, max_lost=2)
    im = InstanceManager(cfg)
    im.push_frame(0, {5: dict(cls=1, features={})}, np.zeros(3),
                  np.array([1.0, 0, 0, 0]), np.zeros(3),
                  np.array([1.0, 0, 0, 0]))
    assert im.slot_of(5) is not None
    for k in range(1, 5):
        im.push_frame(k, {}, np.zeros(3), np.array([1.0, 0, 0, 0]),
                      np.zeros(3), np.array([1.0, 0, 0, 0]))
        im.manage()
    assert im.slot_of(5) is None
