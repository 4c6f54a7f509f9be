"""Images -> LK tracker -> sliding-window estimator, fully closed loop."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dynamic_vins_tpu.estimator.estimator import Estimator, EstimatorConfig
from dynamic_vins_tpu.frontend.tracker import FeatureTracker, TrackerConfig
from dynamic_vins_tpu.sim import frontend_sim, render, synthetic as sim


@pytest.mark.slow
def test_image_pipeline_tracks_trajectory():
    dtype = jnp.float64
    rig = render.small_rig(0.5, dtype)
    seq = sim.generate_sequence(num_frames=12, imu_hz=200.0,
                                num_landmarks=200, seed=4)
    seq = seq._replace(rig=rig)
    inten = render.make_intensities(200, seed=4)

    render_jit = jax.jit(lambda p, q, c: render.render_frame(
        rig, p, q, seq.landmarks, inten, cam=c), static_argnums=2)

    tracker = FeatureTracker(
        TrackerConfig(max_cnt=120, min_dist=12, levels=3, radius=8,
                      stereo=True, dtype=jnp.float64),
        rig.intr)

    p_bc = np.stack([np.asarray(rig.p_bc),
                     np.asarray(rig.right_extrinsics()[0])])
    q_bc = np.stack([np.asarray(rig.q_bc),
                     np.asarray(rig.right_extrinsics()[1])])
    est = Estimator(EstimatorConfig(num_frames=6, lm_capacity=256,
                                    obs_capacity=4096), p_bc, q_bc)
    est.set_initial_pose(np.asarray(seq.gt_p[0]), np.asarray(seq.gt_q[0]),
                         np.asarray(sim.state_at(seq.frame_times[0])[2]))

    frames_imu = frontend_sim.make_frames(seq)
    outs = []
    for k in range(12):
        img_l = render_jit(seq.gt_p[k], seq.gt_q[k], 0)
        img_r = render_jit(seq.gt_p[k], seq.gt_q[k], 1)
        feats = tracker.track(np.asarray(img_l),
                              float(seq.frame_times[k]),
                              img_right=np.asarray(img_r))
        assert len(feats.features) > 30, \
            f"frame {k}: only {len(feats.features)} features"
        _, imu = frames_imu[k]
        outs.append(est.process_frame(feats, imu))

    est_p = np.stack([o.p for o in outs])
    ate = frontend_sim.ate_rmse(est_p, np.asarray(seq.gt_p))
    assert ate < 0.20, f"ATE {ate}"  # blob-render LK bias; see notes
    assert not est.failed
