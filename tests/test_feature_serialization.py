"""Feature-stream record/replay: backend results must be identical."""

import numpy as np

from dynamic_vins_tpu.estimator.estimator import (Estimator,
                                                  EstimatorConfig)
from dynamic_vins_tpu.io import feature_serialization as fs
from dynamic_vins_tpu.sim import frontend_sim, synthetic as sim


def test_record_replay_identical_backend(tmp_path):
    seq = sim.generate_sequence(num_frames=10, imu_hz=200.0,
                                num_landmarks=150, seed=2)
    frames = frontend_sim.make_frames(seq, pixel_noise=0.4, seed=2)
    rig = seq.rig
    p_bc = np.stack([np.asarray(rig.p_bc),
                     np.asarray(rig.right_extrinsics()[0])])
    q_bc = np.stack([np.asarray(rig.q_bc),
                     np.asarray(rig.right_extrinsics()[1])])

    path = str(tmp_path / "feats.jsonl")

    def fresh():
        est = Estimator(EstimatorConfig(num_frames=6, lm_capacity=256,
                                        obs_capacity=4096), p_bc, q_bc)
        est.set_initial_pose(
            np.asarray(seq.gt_p[0]), np.asarray(seq.gt_q[0]),
            np.asarray(sim.state_at(seq.frame_times[0])[2]))
        return est

    # run 1: record
    est1 = fresh()
    outs1 = []
    with fs.FeatureRecorder(path) as rec:
        for frame, imu in frames:
            rec.record(frame, imu)
            outs1.append(est1.process_frame(frame, imu))

    # run 2: replay from disk
    est2 = fresh()
    outs2 = [est2.process_frame(f, i) for f, i in fs.replay(path)]

    assert len(outs1) == len(outs2)
    for a, b in zip(outs1, outs2):
        np.testing.assert_allclose(a.p, b.p, atol=1e-12)
        np.testing.assert_allclose(a.q, b.q, atol=1e-12)
