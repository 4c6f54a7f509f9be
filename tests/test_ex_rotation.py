"""Hand-eye extrinsic rotation self-calibration (InitialEXRotation
parity, `estimator/initial/initial_ex_rotation.cpp`)."""

import jax.numpy as jnp
import numpy as np

from dynamic_vins_tpu.estimator import ex_rotation as exr
from dynamic_vins_tpu.geometry import lie_np


def _rand_quat(rng, max_angle):
    axis = rng.normal(size=3)
    axis /= np.linalg.norm(axis)
    ang = rng.uniform(0.3 * max_angle, max_angle)
    return np.concatenate([[np.cos(ang / 2)], np.sin(ang / 2) * axis])


def _angle_between(q1, q2):
    q = lie_np.quat_multiply(lie_np.quat_conjugate(q1), q2)
    return 2 * np.arctan2(np.linalg.norm(q[1:]), abs(q[0]))


def _make_pairs(rng, q_bc, n, noise=0.0, outliers=0):
    q_cb = lie_np.quat_conjugate(q_bc)
    q_b = np.stack([_rand_quat(rng, 0.3) for _ in range(n)])
    q_c = np.stack([lie_np.quat_multiply(
        lie_np.quat_multiply(q_cb, qb), q_bc) for qb in q_b])
    if noise:
        for i in range(n):
            q_c[i] = lie_np.quat_multiply(q_c[i], _rand_quat(rng, noise))
    for i in rng.choice(n, size=outliers, replace=False) if outliers \
            else []:
        q_c[i] = _rand_quat(rng, 1.0)
    return q_b, q_c


def test_recovers_rotation_exact():
    rng = np.random.default_rng(0)
    q_bc = _rand_quat(rng, 1.2)
    q_b, q_c = _make_pairs(rng, q_bc, 40)
    valid = np.ones(40, bool)
    q_est, svals, conv = exr.calibrate_rotation(
        jnp.asarray(q_b), jnp.asarray(q_c), jnp.asarray(valid))
    assert bool(conv)
    assert _angle_between(np.asarray(q_est), q_bc) < 1e-4


def test_robust_to_noise_and_outliers():
    rng = np.random.default_rng(1)
    q_bc = _rand_quat(rng, 1.0)
    q_b, q_c = _make_pairs(rng, q_bc, 48, noise=0.01, outliers=6)
    valid = np.ones(48, bool)
    q_est, svals, conv = exr.calibrate_rotation(
        jnp.asarray(q_b), jnp.asarray(q_c), jnp.asarray(valid))
    assert bool(conv)
    assert np.degrees(_angle_between(np.asarray(q_est), q_bc)) < 1.5


def test_single_axis_motion_not_converged():
    # rotations about one fixed axis leave the parallel q_bc component
    # unobservable -> singular-value gap must flag it
    rng = np.random.default_rng(2)
    q_bc = _rand_quat(rng, 1.0)
    axis = np.array([0.0, 0.0, 1.0])
    q_b = np.stack([np.concatenate([[np.cos(a / 2)],
                                    np.sin(a / 2) * axis])
                    for a in rng.uniform(0.05, 0.3, 30)])
    q_cb = lie_np.quat_conjugate(q_bc)
    q_c = np.stack([lie_np.quat_multiply(
        lie_np.quat_multiply(q_cb, qb), q_bc) for qb in q_b])
    valid = np.ones(30, bool)
    _, svals, conv = exr.calibrate_rotation(
        jnp.asarray(q_b), jnp.asarray(q_c), jnp.asarray(valid))
    assert not bool(conv)


def test_host_calibrator_accumulates():
    rng = np.random.default_rng(3)
    q_bc = _rand_quat(rng, 0.8)
    q_b, q_c = _make_pairs(rng, q_bc, 25, noise=0.005)
    cal = exr.ExRotationCalibrator()
    conv = False
    for i in range(25):
        cal.push(q_b[i], q_c[i])
        q_est, conv = cal.solve()
    assert conv and cal.result is not None
    assert np.degrees(_angle_between(cal.result, q_bc)) < 1.0


def test_estimator_wiring_smoke():
    # the config flag constructs the calibrator and the per-frame hook
    # runs without disturbing a plain synthetic VIO startup
    from dynamic_vins_tpu.estimator.estimator import (Estimator,
                                                      EstimatorConfig)
    from dynamic_vins_tpu.sim import frontend_sim, synthetic as sim

    seq = sim.generate_sequence(num_frames=12, imu_hz=100.0,
                                num_landmarks=120, seed=0)
    frames = frontend_sim.make_frames(seq, pixel_noise=0.3)
    rig = seq.rig
    p_bc = np.stack([np.asarray(rig.p_bc),
                     np.asarray(rig.right_extrinsics()[0])])
    q_bc = np.stack([np.asarray(rig.q_bc),
                     np.asarray(rig.right_extrinsics()[1])])
    est = Estimator(EstimatorConfig(num_frames=6, lm_capacity=256,
                                    obs_capacity=2048,
                                    calibrate_extrinsic_rotation=True),
                    p_bc, q_bc)
    est.set_initial_pose(np.asarray(seq.gt_p[0]), np.asarray(seq.gt_q[0]),
                         np.asarray(sim.state_at(seq.frame_times[0])[2]))
    outs = [est.process_frame(f, i) for f, i in frames]
    assert est.ex_calib is not None and est.ex_calib.n > 0
    err = np.linalg.norm(np.asarray(outs[-1].p) - np.asarray(seq.gt_p[-1]))
    assert np.isfinite(err)
    if est.ex_calib.result is not None:
        # the calibrated q_bc must actually be the rig's extrinsic — a
        # sign/direction regression in the hand-eye pairing would
        # otherwise still pass the smoke assertions above
        ang = _angle_between(np.asarray(est.ex_calib.result),
                             np.asarray(rig.q_bc))
        assert np.degrees(ang) < 3.0, \
            f"calibrated extrinsic off by {np.degrees(ang):.2f} deg"
        # and the estimate must have been written into the window state
        ang_state = _angle_between(np.asarray(est.state.q_bc[0]),
                                   np.asarray(rig.q_bc))
        assert np.degrees(ang_state) < 3.0
