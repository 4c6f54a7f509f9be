"""Per-object BA: recover a moving box's trajectory/dims/velocity."""

import jax
import jax.numpy as jnp
import numpy as np

from dynamic_vins_tpu.factors.object_factors import ObjectWindow
from dynamic_vins_tpu.geometry import lie
from dynamic_vins_tpu.sim import synthetic as sim
from dynamic_vins_tpu.solver.object_solver import (ObjectProblem,
                                                   ObjectSolverConfig,
                                                   solve_all, solve_one)


def _make_moving_object(F=6, No=512, Lo=32, Ne=64, seed=0,
                        pixel_noise=0.0):
    rng = np.random.default_rng(seed)
    seq = sim.generate_sequence(num_frames=F, num_landmarks=4, seed=1)
    rig = seq.rig
    times = np.asarray(seq.frame_times)

    # object: a 2x4x1.5 box driving straight ahead of the camera
    dims = np.array([4.0, 2.0, 1.5])
    v_obj = np.array([-0.8, 2.0, 0.0])
    w_obj = np.array([0.0, 0.0, 0.25])
    p0 = np.asarray(seq.gt_p[0]) + np.asarray(
        lie.quat_rotate(seq.gt_q[0], jnp.asarray([8.0, 0.0, -0.5])))
    q0 = np.asarray(seq.gt_q[0])

    p_wo = np.zeros((F, 3))
    q_wo = np.zeros((F, 4))
    for k in range(F):
        dt = times[k] - times[0]
        p_wo[k] = p0 + v_obj * dt
        q_wo[k] = np.asarray(lie.quat_multiply(
            lie.so3_exp_quat(jnp.asarray(w_obj * dt)), jnp.asarray(q0)))

    # rigid surface points (object frame); zero-mean so the GT object
    # frame matches the solver's centroid gauge anchoring
    pts_obj = rng.uniform(-0.5, 0.5, size=(Lo, 3)) * dims[None, :]
    pts_obj -= pts_obj.mean(axis=0, keepdims=True)

    # camera world->cam per frame and camera (stereo)
    p_cw = np.zeros((F, 2, 3))
    q_cw = np.zeros((F, 2, 4))
    extr = [(rig.p_bc, rig.q_bc), rig.right_extrinsics()]
    for k in range(F):
        for c in range(2):
            p_wc, q_wc = lie.pose_compose(seq.gt_p[k], seq.gt_q[k],
                                          extr[c][0], extr[c][1])
            pc, qc = lie.pose_inverse(p_wc, q_wc)
            p_cw[k, c] = np.asarray(pc)
            q_cw[k, c] = np.asarray(qc)

    # observations: each landmark in each frame, both cameras
    obs_frame, obs_cam, obs_lm, obs_norm, obs_valid = [], [], [], [], []
    for k in range(F):
        for c in range(2):
            for l in range(Lo):
                pw = np.asarray(lie.quat_rotate(
                    jnp.asarray(q_wo[k]),
                    jnp.asarray(pts_obj[l]))) + p_wo[k]
                pc = np.asarray(lie.quat_rotate(
                    jnp.asarray(q_cw[k, c]),
                    jnp.asarray(pw))) + p_cw[k, c]
                if pc[2] < 0.5:
                    continue
                uv = pc[:2] / pc[2]
                if pixel_noise > 0:
                    uv = uv + rng.normal(scale=pixel_noise / 460.0,
                                         size=2)
                obs_frame.append(k)
                obs_cam.append(c)
                obs_lm.append(l)
                obs_norm.append(uv)
                obs_valid.append(True)
    n = len(obs_frame)
    assert n > Lo * (F - 1)

    def pad(a, shape, dtype=np.float64):
        out = np.zeros(shape, dtype)
        a = np.asarray(a)
        out[: len(a)] = a
        return out

    # extra points: world points on the object per frame (noisy)
    extra_pts = np.zeros((F, Ne, 3))
    extra_valid = np.zeros((F, Ne), bool)
    for k in range(F):
        sel = np.tile(np.arange(Lo), Ne // Lo + 1)[:Ne]
        pw = np.asarray(lie.quat_rotate(
            jnp.asarray(q_wo[k])[None, :],
            jnp.asarray(pts_obj[sel]))) + p_wo[k][None, :]
        extra_pts[k] = pw + rng.normal(scale=0.02, size=(Ne, 3))
        extra_valid[k] = True

    prob = ObjectProblem(
        obs_frame=jnp.asarray(pad(obs_frame, (No,), np.int32)),
        obs_cam=jnp.asarray(pad(obs_cam, (No,), np.int32)),
        obs_lm=jnp.asarray(pad(obs_lm, (No,), np.int32)),
        obs_norm=jnp.asarray(pad(obs_norm, (No, 2))),
        obs_valid=jnp.asarray(pad(obs_valid, (No,), bool)),
        extra_pts=jnp.asarray(extra_pts),
        extra_valid=jnp.asarray(extra_valid),
        dims_det=jnp.asarray(dims),
        dims_det_valid=jnp.asarray(True),
        q_det=jnp.asarray(q_wo),
        det_valid=jnp.ones((F,), bool),
        frame_valid=jnp.ones((F,), bool),
        lm_valid=jnp.ones((Lo,), bool),
        lm_prior=jnp.asarray(pts_obj),
        times=jnp.asarray(times),
        p_cw=jnp.asarray(p_cw),
        q_cw=jnp.asarray(q_cw))

    gt = ObjectWindow.make(jnp.asarray(p_wo), jnp.asarray(q_wo),
                           jnp.asarray(v_obj), jnp.asarray(w_obj),
                           jnp.asarray(dims))
    return gt, jnp.asarray(pts_obj), prob


def test_object_ba_recovers_pose_and_dims(rng):
    gt, pts_obj, prob = _make_moving_object(pixel_noise=0.5)
    # perturb
    d = rng.normal(scale=0.05, size=(6, 6))
    p0, q0 = lie.pose_boxplus(gt.p, gt.q, jnp.asarray(d))
    state0 = gt._replace(
        p=p0, q=q0,
        v=gt.v + jnp.asarray(rng.normal(scale=0.2, size=3)),
        w=gt.w + jnp.asarray(rng.normal(scale=0.05, size=3)),
        dims=gt.dims * 1.15)
    lm0 = pts_obj + jnp.asarray(rng.normal(scale=0.03,
                                           size=pts_obj.shape))
    cfg = ObjectSolverConfig(max_iters=10)
    st, lm, cost = solve_one(state0, lm0, prob, cfg,
                             jnp.asarray(True))
    # information limit: 0.11 m baseline at ~8 m with 0.5 px noise
    # gives ~5 cm stereo depth uncertainty for the whole cloud
    perr = np.max(np.linalg.norm(np.asarray(st.p - gt.p), axis=-1))
    assert perr < 0.12, perr
    verr = np.linalg.norm(np.asarray(st.v - gt.v))
    assert verr < 0.2, verr
    derr = np.max(np.abs(np.asarray(st.dims - gt.dims)))
    assert derr < 0.3, derr


def test_object_ba_vmapped_batch(rng):
    gt, pts_obj, prob = _make_moving_object()
    O = 4
    stack = lambda x: jnp.stack([x] * O)
    states = jax.tree.map(stack, gt)
    probs = jax.tree.map(stack, prob)
    lms = stack(pts_obj)
    active = jnp.asarray([True, True, False, True])
    # perturb each object differently
    d = jnp.asarray(rng.normal(scale=0.03, size=(O, 6, 6)))
    p0, q0 = lie.pose_boxplus(states.p, states.q, d)
    states = states._replace(p=p0, q=q0)
    cfg = ObjectSolverConfig(max_iters=8)
    st, lm, cost = solve_all(states, lms, probs, cfg, active)
    perr = np.linalg.norm(np.asarray(st.p - stack(gt.p)), axis=-1)
    # ~6 cm one-sided bias from the enclose hinge on the 2 cm-noisy
    # extra cloud is inherent to the factor (reference behaviour)
    assert perr[0].max() < 0.08
    assert perr[1].max() < 0.08
    assert perr[3].max() < 0.08
    # inactive object untouched
    np.testing.assert_allclose(np.asarray(st.p[2]), np.asarray(p0[2]),
                               atol=1e-12)
