"""Pipelined device-resident steady state must reproduce the
sequential megastep trajectory (outputs lag 2 frames but keep their own
timestamps, so the written trajectory is the same)."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # e2e sequences; fast subset: -m 'not slow'

from dynamic_vins_tpu.estimator.estimator import Estimator, EstimatorConfig
from dynamic_vins_tpu.sim import frontend_sim, synthetic as sim


def _run(pipelined: bool, n_frames=26):
    seq = sim.generate_sequence(num_frames=n_frames, imu_hz=100.0,
                                num_landmarks=180, seed=0)
    frames = frontend_sim.make_frames(seq, pixel_noise=0.4)
    rig = seq.rig
    p_bc = np.stack([np.asarray(rig.p_bc),
                     np.asarray(rig.right_extrinsics()[0])])
    q_bc = np.stack([np.asarray(rig.q_bc),
                     np.asarray(rig.right_extrinsics()[1])])
    est = Estimator(EstimatorConfig(num_frames=8, lm_capacity=256,
                                    obs_capacity=4096,
                                    pipelined=pipelined), p_bc, q_bc)
    est.set_initial_pose(np.asarray(seq.gt_p[0]), np.asarray(seq.gt_q[0]),
                         np.asarray(sim.state_at(seq.frame_times[0])[2]))
    outs = []
    for frame, imu in frames:
        o = est.process_frame(frame, imu)
        if o is not None:
            outs.append(o)
    outs.extend(est.flush())
    assert not est.failed
    return {round(o.timestamp, 6): o for o in outs}, seq


def test_pipelined_matches_sequential():
    a, seq = _run(False)
    b, _ = _run(True)
    common = sorted(set(a) & set(b))
    # pipelined covers every frame the sequential path covered
    assert len(common) == len(a), (len(common), len(a), len(b))
    errs = [np.linalg.norm(a[t].p - b[t].p) for t in common]
    # identical math, different packing site for the PnP initial guess
    # (device-resident state vs host mirror): converged solutions drift
    # apart slowly but stay millimetric over the sequence
    assert np.max(errs) < 2e-2, f"max pose divergence {np.max(errs)}"

    # both trajectories accurate vs ground truth
    def ate(d):
        ts = sorted(d)
        p = np.stack([d[t].p for t in ts])
        gt = np.stack([np.asarray(sim.state_at(t)[0]) for t in ts])
        return float(np.sqrt(np.mean(np.sum((p - gt) ** 2, -1))))

    assert ate(b) < 0.12, f"pipelined ATE {ate(b)}"
    assert abs(ate(a) - ate(b)) < 5e-3


def test_pipelined_nonkeyframe_path():
    # low-parallax sequence forces non-keyframe slides through the
    # on-device merged-edge branch
    params = sim.TrajectoryParams(omega=0.08, z_amp=0.05,
                                  roll_amp=0.02, pitch_amp=0.02)
    seq = sim.generate_sequence(
        num_frames=24, imu_hz=100.0, num_landmarks=150, seed=6,
        params=params)
    frames = frontend_sim.make_frames(seq, pixel_noise=0.3)
    rig = seq.rig
    p_bc = np.stack([np.asarray(rig.p_bc),
                     np.asarray(rig.right_extrinsics()[0])])
    q_bc = np.stack([np.asarray(rig.q_bc),
                     np.asarray(rig.right_extrinsics()[1])])
    est = Estimator(EstimatorConfig(num_frames=8, lm_capacity=256,
                                    obs_capacity=4096, pipelined=True),
                    p_bc, q_bc)
    est.set_initial_pose(np.asarray(seq.gt_p[0]), np.asarray(seq.gt_q[0]),
                         np.asarray(sim.state_at(seq.frame_times[0],
                                                 params)[2]))
    outs = []
    kf_flags = []
    for frame, imu in frames:
        o = est.process_frame(frame, imu)
        if o is not None:
            outs.append(o)
        if getattr(est, "_pipe_q", None) is not None and est._pipe_q:
            kf_flags.append(est._pipe_q[-1][2])
    outs.extend(est.flush())
    assert not est.failed
    assert any(not f for f in kf_flags), "no non-keyframe exercised"
    for o in outs:
        gt = np.asarray(sim.state_at(o.timestamp, params)[0])
        assert np.linalg.norm(o.p - gt) < 0.25


def test_pipelined_dynamic_mode():
    """Dynamic mode rides the pipelined ego path: the instance pipeline
    aligns window poses by timestamp against the lagged mirror and
    IMU-predicts the in-flight frames. Ego accuracy must match the
    sequential dynamic path; objects must be tracked and estimated."""
    from dynamic_vins_tpu.sim import objects as objsim

    seq = sim.generate_sequence(num_frames=26, imu_hz=100.0,
                                acc_noise=0.03, gyr_noise=0.003,
                                num_landmarks=200, seed=0)
    frames = frontend_sim.make_frames(seq, pixel_noise=0.4)
    inst_frames, truths = objsim.make_object_frames(seq, num_objects=2,
                                                    seed=0)
    rig = seq.rig
    p_bc = np.stack([np.asarray(rig.p_bc),
                     np.asarray(rig.right_extrinsics()[0])])
    q_bc = np.stack([np.asarray(rig.q_bc),
                     np.asarray(rig.right_extrinsics()[1])])

    def run(pipelined):
        est = Estimator(EstimatorConfig(num_frames=8, lm_capacity=256,
                                        obs_capacity=4096, dynamic=True,
                                        pipelined=pipelined), p_bc, q_bc)
        est.set_initial_pose(np.asarray(seq.gt_p[0]),
                             np.asarray(seq.gt_q[0]),
                             np.asarray(sim.state_at(
                                 seq.frame_times[0])[2]))
        outs = []
        for (frame, imu), inst in zip(frames, inst_frames):
            o = est.process_frame(frame, imu, instances=inst)
            if o is not None:
                outs.append(o)
        outs.extend(est.flush())
        assert not est.failed
        ate = frontend_sim.ate_rmse(
            np.stack([o.p for o in outs]),
            np.stack([np.asarray(sim.state_at(o.timestamp)[0])
                      for o in outs]))
        return ate, est

    ate_seq, est_seq = run(False)
    ate_pipe, est_pipe = run(True)
    # ego: pipelined tracks the sequential dynamic path
    assert ate_pipe < max(2.0 * ate_seq, ate_seq + 0.02), (ate_seq,
                                                           ate_pipe)
    # objects: estimated in the pipelined path with sane positions
    states = est_pipe.get_instance_states()
    assert len(states) >= 1
    for t in truths:
        info = states.get(t.track_id)
        if info is None:
            continue
        err = np.linalg.norm(np.asarray(info["p"]) - t.gt_p[-1])
        assert err < 1.5, (t.track_id, err)
