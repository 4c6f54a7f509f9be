"""Full dynamic mode: ego VIO + per-object 6-DoF estimation together."""

import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # e2e sequences; fast subset: -m 'not slow'

from dynamic_vins_tpu.estimator.estimator import Estimator, EstimatorConfig
from dynamic_vins_tpu.geometry import lie
from dynamic_vins_tpu.sim import frontend_sim, synthetic as sim


def _object_instances(seq, times, F, seed=0):
    """Per-frame instance dicts for one moving box."""
    rng = np.random.default_rng(seed)
    rig = seq.rig
    dims = np.array([4.0, 2.0, 1.5])
    v_obj = np.array([-0.8, 2.0, 0.0])
    p0 = np.asarray(seq.gt_p[0]) + np.asarray(
        lie.quat_rotate(seq.gt_q[0], jnp.asarray([8.0, 0.0, -0.5])))
    q0 = np.asarray(seq.gt_q[0])
    n_pts = 24
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
                pc = np.asarray(lie.pose_transform_point(
                    p_cw, q_cw, jnp.asarray(pw)))
                obs.append(pc[:2] / pc[2] if pc[2] > 0.5 else None)
            if obs[0] is not None:
                pl = np.append(obs[0] + rng.normal(scale=0.5 / 460, size=2),
                               1.0)
                pr = None
                if obs[1] is not None:
                    pr = np.append(obs[1]
                                   + rng.normal(scale=0.5 / 460, size=2),
                                   1.0)
                feats[l] = (pl, pr)
                extra.append(pw + rng.normal(scale=0.03, size=3))
        frames.append({9: dict(cls=1, features=feats,
                               extra_pts_world=np.asarray(extra),
                               dims_det=dims, q_det=q0)})
    return frames, np.asarray(gt_p), v_obj, dims


def test_dynamic_mode_ego_and_object():
    F_total = 14
    seq = sim.generate_sequence(num_frames=F_total, imu_hz=200.0,
                                acc_noise=0.02, gyr_noise=0.002,
                                num_landmarks=250, seed=0)
    frames = frontend_sim.make_frames(seq, pixel_noise=0.5, seed=0)
    times = np.asarray(seq.frame_times)
    inst_frames, gt_obj_p, v_obj, dims = _object_instances(
        seq, times, F_total)

    rig = seq.rig
    p_bc = np.stack([np.asarray(rig.p_bc),
                     np.asarray(rig.right_extrinsics()[0])])
    q_bc = np.stack([np.asarray(rig.q_bc),
                     np.asarray(rig.right_extrinsics()[1])])
    est = Estimator(EstimatorConfig(num_frames=6, lm_capacity=384,
                                    obs_capacity=6144, dynamic=True),
                    p_bc, q_bc)
    est.set_initial_pose(np.asarray(seq.gt_p[0]), np.asarray(seq.gt_q[0]),
                         np.asarray(sim.state_at(seq.frame_times[0])[2]))

    outs = []
    for k, (frame, imu) in enumerate(frames):
        outs.append(est.process_frame(frame, imu,
                                      instances=inst_frames[k]))

    # ego accuracy unchanged by the dynamic pipeline
    est_p = np.stack([o.p for o in outs])
    ate = frontend_sim.ate_rmse(est_p, np.asarray(seq.gt_p))
    assert ate < 0.08, f"ego ATE {ate}"

    inst = est.get_instance_states()
    assert 9 in inst
    o = inst[9]
    assert not o["is_static"]
    np.testing.assert_allclose(o["v"], v_obj, atol=0.35)
    np.testing.assert_allclose(o["dims"], dims, atol=0.4)
    err = np.linalg.norm(o["p"] - gt_obj_p[-1])
    assert err < 0.5, err
