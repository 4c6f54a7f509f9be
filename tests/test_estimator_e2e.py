"""End-to-end sliding-window VIO on synthetic sequences."""

import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # e2e sequences; fast subset: -m 'not slow'

from dynamic_vins_tpu.estimator.estimator import Estimator, EstimatorConfig
from dynamic_vins_tpu.sim import frontend_sim, synthetic as sim


def _run_sequence(num_frames=25, pixel_noise=0.5, acc_noise=0.05,
                  gyr_noise=0.005, use_imu=True, cfg_kwargs=None):
    seq = sim.generate_sequence(num_frames=num_frames, imu_hz=200.0,
                                acc_noise=acc_noise, gyr_noise=gyr_noise,
                                num_landmarks=250, seed=0)
    frames = frontend_sim.make_frames(seq, pixel_noise=pixel_noise)
    rig = seq.rig
    p_bc = np.stack([np.asarray(rig.p_bc),
                     np.asarray(rig.right_extrinsics()[0])])
    q_bc = np.stack([np.asarray(rig.q_bc),
                     np.asarray(rig.right_extrinsics()[1])])
    cfg = EstimatorConfig(num_frames=6, lm_capacity=384,
                          obs_capacity=6144, use_imu=use_imu,
                          **(cfg_kwargs or {}))
    # align the estimator's world frame with the simulator's (gravity
    # aligned, but yaw/position free): feed gt start pose
    est = Estimator(cfg, p_bc, q_bc)
    est.set_initial_pose(np.asarray(seq.gt_p[0]), np.asarray(seq.gt_q[0]),
                         np.asarray(sim.state_at(seq.frame_times[0])[2]))

    outs = []
    for frame, imu in frames:
        out = est.process_frame(frame, imu if use_imu else None)
        outs.append(out)
    assert not est.failed
    est_p = np.stack([o.p for o in outs])
    gt_p = np.asarray(seq.gt_p)
    return frontend_sim.ate_rmse(est_p, gt_p), est, outs


def test_stereo_vio_tracks_trajectory():
    ate, est, outs = _run_sequence()
    # ~9m circle, 2.4s; sub-decimeter ATE with 0.5px + IMU noise
    assert ate < 0.06, f"ATE {ate}"
    assert est.initialized


def test_stereo_visual_only():
    ate, est, outs = _run_sequence(use_imu=False, acc_noise=0.0,
                                   gyr_noise=0.0)
    assert ate < 0.15, f"ATE {ate}"


def test_clean_data_high_accuracy():
    ate, est, outs = _run_sequence(pixel_noise=0.0, acc_noise=0.0,
                                   gyr_noise=0.0)
    assert ate < 0.01, f"ATE {ate}"


def test_estimator_reset():
    ate, est, outs = _run_sequence(num_frames=10)
    est.reset()
    assert not est.initialized
    assert est.frame_count == 0


def test_megastep_matches_multidispatch():
    """The single-dispatch steady-state megastep must reproduce the
    multi-dispatch reference path (same math, fused)."""
    ate_fast, est_fast, outs_fast = _run_sequence(
        num_frames=14, cfg_kwargs={"use_megastep": True})
    ate_ref, est_ref, outs_ref = _run_sequence(
        num_frames=14, cfg_kwargs={"use_megastep": False})
    p_fast = np.stack([o.p for o in outs_fast])
    p_ref = np.stack([o.p for o in outs_ref])
    # identical inputs; paths differ only in dispatch granularity
    assert np.allclose(p_fast, p_ref, atol=5e-4), \
        np.abs(p_fast - p_ref).max()
    assert abs(ate_fast - ate_ref) < 5e-4


def test_change_sensor_type():
    """Runtime sensor switching (ChangeSensorType parity,
    estimator.cpp:697-726)."""
    seq = sim.generate_sequence(num_frames=16, imu_hz=200.0,
                                acc_noise=0.02, gyr_noise=0.002,
                                num_landmarks=250, seed=0)
    frames = frontend_sim.make_frames(seq, pixel_noise=0.3)
    rig = seq.rig
    p_bc = np.stack([np.asarray(rig.p_bc),
                     np.asarray(rig.right_extrinsics()[0])])
    q_bc = np.stack([np.asarray(rig.q_bc),
                     np.asarray(rig.right_extrinsics()[1])])
    cfg = EstimatorConfig(num_frames=6, lm_capacity=384,
                          obs_capacity=6144)
    est = Estimator(cfg, p_bc, q_bc)
    est.set_initial_pose(np.asarray(seq.gt_p[0]), np.asarray(seq.gt_q[0]),
                         np.asarray(sim.state_at(seq.frame_times[0])[2]))

    # both off refused
    assert not est.change_sensor_type(False, False)
    assert est.cfg.use_imu and est.cfg.stereo

    outs = []
    for i, (frame, imu) in enumerate(frames):
        if i == 8:
            # stereo -> mono mid-run: right obs stop being ingested
            assert est.change_sensor_type(True, False)
            before = est.fm.has_right[:, :].sum()
        out = est.process_frame(frame, imu)
        outs.append(out)
        if i == 8:
            k = min(est.frame_count - 1, cfg.num_frames - 1)
            assert not est.fm.has_right[:, k].any()
    assert not est.failed
    assert est.initialized

    # IMU off: prior dropped, keeps running visual-only
    assert est.change_sensor_type(False, True)
    assert not bool(est.prior.valid)
    # IMU back on: full restart
    assert est.change_sensor_type(True, True)
    assert est.frame_count == 0 and not est.initialized
