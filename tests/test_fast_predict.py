"""IMU-rate low-latency odometry (FastPredictIMU / UpdateLatestStates
parity, `estimator/estimator.cpp:1376,1395`)."""

import numpy as np

from dynamic_vins_tpu.estimator.estimator import Estimator, EstimatorConfig
from dynamic_vins_tpu.sim import frontend_sim, synthetic as sim


def test_fast_predict_tracks_truth_between_frames():
    seq = sim.generate_sequence(num_frames=15, imu_hz=100.0,
                                num_landmarks=150, seed=2)
    frames = frontend_sim.make_frames(seq, pixel_noise=0.3)
    rig = seq.rig
    p_bc = np.stack([np.asarray(rig.p_bc),
                     np.asarray(rig.right_extrinsics()[0])])
    q_bc = np.stack([np.asarray(rig.q_bc),
                     np.asarray(rig.right_extrinsics()[1])])
    est = Estimator(EstimatorConfig(num_frames=8, lm_capacity=256,
                                    obs_capacity=2048), p_bc, q_bc)
    est.set_initial_pose(np.asarray(seq.gt_p[0]), np.asarray(seq.gt_q[0]),
                         np.asarray(sim.state_at(seq.frame_times[0])[2]))

    errs = []
    for k, (frame, imu) in enumerate(frames):
        est.process_frame(frame, imu)
        if k + 1 >= len(frames) or not est.initialized:
            continue
        # replay the NEXT interval's IMU through the fast path and
        # compare the imu-rate poses against analytic ground truth
        acc, gyr, dts = frames[k + 1][1]
        t = seq.frame_times[k]
        for i in range(len(dts)):
            t = t + dts[i]
            out = est.fast_predict(float(t), acc[i + 1], gyr[i + 1])
            assert out is not None
            p_gt = np.asarray(sim.state_at(float(t))[0])
            errs.append(np.linalg.norm(out.p - p_gt))
    assert errs, "fast path never produced output"
    assert np.median(errs) < 0.25, f"median fast-predict err {np.median(errs)}"
    assert np.all(np.isfinite(errs))


def test_fast_predict_none_before_first_frame():
    rig_p = np.zeros((2, 3))
    q = np.tile([1.0, 0, 0, 0], (2, 1))
    est = Estimator(EstimatorConfig(num_frames=6, lm_capacity=64,
                                    obs_capacity=512), rig_p, q)
    assert est.fast_predict(0.1, np.zeros(3), np.zeros(3)) is None
