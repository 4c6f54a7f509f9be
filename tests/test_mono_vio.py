"""Monocular VIO end-to-end: SfM init + visual-inertial alignment."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # e2e sequences; fast subset: -m 'not slow'

from dynamic_vins_tpu.estimator.estimator import (Estimator,
                                                  EstimatorConfig)
from dynamic_vins_tpu.io.evaluation import ate_rmse, umeyama_alignment
from dynamic_vins_tpu.sim import frontend_sim, synthetic as sim


def test_mono_vio_initializes_with_metric_scale():
    seq = sim.generate_sequence(num_frames=40, imu_hz=200.0,
                                acc_noise=0.02, gyr_noise=0.002,
                                num_landmarks=250, seed=0)
    frames = frontend_sim.make_frames(seq, pixel_noise=0.5, stereo=False,
                                      seed=0)
    rig = seq.rig
    p_bc = np.stack([np.asarray(rig.p_bc),
                     np.asarray(rig.right_extrinsics()[0])])
    q_bc = np.stack([np.asarray(rig.q_bc),
                     np.asarray(rig.right_extrinsics()[1])])
    est = Estimator(EstimatorConfig(num_frames=11, lm_capacity=384,
                                    obs_capacity=6144, stereo=False),
                    p_bc, q_bc)
    outs = [est.process_frame(*f) for f in frames]
    assert est.initialized, "mono init failed"
    assert not est.failed

    # mono world frame is gravity-aligned/yaw-free with its own origin
    # and only exists after init (the reference publishes nothing before
    # NON_LINEAR either). The linear alignment gives scale to ~15%; the
    # subsequent windowed BA refines it — evaluate the CONVERGED tail.
    t = np.asarray(seq.frame_times)[25:]
    est_p = np.stack([o.p for o in outs])[25:]
    ate = ate_rmse(t, est_p, t, np.asarray(seq.gt_p)[25:], align=True,
                   with_scale=False)
    assert ate < 0.10, f"mono ATE {ate}"

    # metric scale must come from the IMU: Umeyama WITH scale ~ 1
    s, R, tt = umeyama_alignment(est_p, np.asarray(seq.gt_p)[25:],
                                 with_scale=True)
    assert abs(s - 1.0) < 0.05, f"scale error {s}"
