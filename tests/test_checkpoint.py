"""Checkpoint/resume: estimator continues identically after restore."""

import numpy as np

from dynamic_vins_tpu.estimator.estimator import (Estimator,
                                                  EstimatorConfig)
from dynamic_vins_tpu.sim import frontend_sim, synthetic as sim


def test_checkpoint_resume_continues_identically(tmp_path):
    seq = sim.generate_sequence(num_frames=14, imu_hz=200.0,
                                num_landmarks=150, seed=1)
    frames = frontend_sim.make_frames(seq, pixel_noise=0.4, seed=1)
    rig = seq.rig
    p_bc = np.stack([np.asarray(rig.p_bc),
                     np.asarray(rig.right_extrinsics()[0])])
    q_bc = np.stack([np.asarray(rig.q_bc),
                     np.asarray(rig.right_extrinsics()[1])])

    def fresh():
        est = Estimator(EstimatorConfig(num_frames=6, lm_capacity=256,
                                        obs_capacity=4096), p_bc, q_bc)
        est.set_initial_pose(
            np.asarray(seq.gt_p[0]), np.asarray(seq.gt_q[0]),
            np.asarray(sim.state_at(seq.frame_times[0])[2]))
        return est

    # continuous run
    est_a = fresh()
    outs_a = [est_a.process_frame(*f) for f in frames]

    # run to frame 8, checkpoint, restore into a new estimator, continue
    est_b = fresh()
    for f in frames[:8]:
        est_b.process_frame(*f)
    ckpt = str(tmp_path / "est.npz")
    est_b.save_checkpoint(ckpt)

    est_c = fresh()
    est_c.load_checkpoint(ckpt)
    outs_c = [est_c.process_frame(*f) for f in frames[8:]]

    for a, b in zip(outs_a[8:], outs_c):
        np.testing.assert_allclose(a.p, b.p, atol=1e-6)
        np.testing.assert_allclose(a.v, b.v, atol=1e-6)
