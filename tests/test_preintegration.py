import jax
import jax.numpy as jnp
import numpy as np

from dynamic_vins_tpu.geometry import lie
from dynamic_vins_tpu.imu import preintegration as pre
from dynamic_vins_tpu.sim import synthetic as sim


def _interval(seq, i, j, imu_per_frame):
    a, b = i * imu_per_frame, j * imu_per_frame
    acc = seq.acc[a:b + 1]
    gyr = seq.gyr[a:b + 1]
    dt = jnp.diff(seq.imu_times[a:b + 1])
    return acc, gyr, dt


def test_zero_noise_residual_is_zero():
    seq = sim.generate_sequence(num_frames=5, imu_hz=1000.0)
    ipf = 100
    zeros = jnp.zeros(3, dtype=jnp.float64)
    for i in range(4):
        acc, gyr, dt = _interval(seq, i, i + 1, ipf)
        p = pre.preintegrate(acc, gyr, dt, zeros, zeros)
        _, _, v_i = sim.state_at(seq.frame_times[i])
        _, _, v_j = sim.state_at(seq.frame_times[i + 1])
        r = pre.evaluate(p, seq.gt_p[i], seq.gt_q[i], v_i, zeros, zeros,
                         seq.gt_p[i + 1], seq.gt_q[i + 1], v_j, zeros, zeros)
        np.testing.assert_allclose(np.asarray(r), 0.0, atol=2e-4)


def test_known_bias_recovered_by_correction():
    """Integrating biased measurements + bias-corrected evaluate ≈ 0."""
    ba = (0.05, -0.03, 0.02)
    bg = (0.004, 0.006, -0.003)
    seq = sim.generate_sequence(num_frames=3, imu_hz=1000.0,
                                acc_bias=ba, gyr_bias=bg)
    ipf = 100
    zeros = jnp.zeros(3, dtype=jnp.float64)
    acc, gyr, dt = _interval(seq, 0, 1, ipf)
    # linearize at zero bias, evaluate at true bias: first-order correction
    p = pre.preintegrate(acc, gyr, dt, zeros, zeros)
    _, _, v0 = sim.state_at(seq.frame_times[0])
    _, _, v1 = sim.state_at(seq.frame_times[1])
    ba_j = jnp.asarray(ba)
    bg_j = jnp.asarray(bg)
    r = pre.evaluate(p, seq.gt_p[0], seq.gt_q[0], v0, ba_j, bg_j,
                     seq.gt_p[1], seq.gt_q[1], v1, ba_j, bg_j)
    # first-order bias correction: small residual (not exactly 0)
    assert np.max(np.abs(np.asarray(r))) < 5e-3
    # linearizing AT the true bias must be much better
    p2 = pre.preintegrate(acc, gyr, dt, ba_j, bg_j)
    r2 = pre.evaluate(p2, seq.gt_p[0], seq.gt_q[0], v0, ba_j, bg_j,
                      seq.gt_p[1], seq.gt_q[1], v1, ba_j, bg_j)
    np.testing.assert_allclose(np.asarray(r2), 0.0, atol=2e-4)


def test_bias_jacobian_finite_difference():
    seq = sim.generate_sequence(num_frames=2, imu_hz=200.0)
    ipf = 20
    zeros = jnp.zeros(3, dtype=jnp.float64)
    acc, gyr, dt = _interval(seq, 0, 1, ipf)
    p0 = pre.preintegrate(acc, gyr, dt, zeros, zeros)
    eps = 1e-6
    for k in range(3):
        d = jnp.zeros(3, dtype=jnp.float64).at[k].set(eps)
        pa = pre.preintegrate(acc, gyr, dt, d, zeros)
        pg = pre.preintegrate(acc, gyr, dt, zeros, d)
        np.testing.assert_allclose(
            np.asarray((pa.delta_p - p0.delta_p) / eps),
            np.asarray(p0.dp_dba[:, k]), atol=5e-4)
        np.testing.assert_allclose(
            np.asarray((pg.delta_p - p0.delta_p) / eps),
            np.asarray(p0.dp_dbg[:, k]), atol=5e-4)
        np.testing.assert_allclose(
            np.asarray((pa.delta_v - p0.delta_v) / eps),
            np.asarray(p0.dv_dba[:, k]), atol=5e-4)
        np.testing.assert_allclose(
            np.asarray((pg.delta_v - p0.delta_v) / eps),
            np.asarray(p0.dv_dbg[:, k]), atol=5e-4)
        dq = lie.quat_log(lie.quat_multiply(
            lie.quat_conjugate(p0.delta_q), pg.delta_q)) / eps
        np.testing.assert_allclose(np.asarray(dq),
                                   np.asarray(p0.dq_dbg[:, k] * 2.0) / 2.0,
                                   atol=5e-4)


def test_covariance_psd_and_sqrt_info():
    seq = sim.generate_sequence(num_frames=2, imu_hz=200.0)
    zeros = jnp.zeros(3, dtype=jnp.float64)
    acc, gyr, dt = _interval(seq, 0, 1, 20)
    p = pre.preintegrate(acc, gyr, dt, zeros, zeros)
    cov = np.asarray(p.covariance)
    eig = np.linalg.eigvalsh(cov)
    assert eig.min() > -1e-12
    U = np.asarray(p.sqrt_info())
    np.testing.assert_allclose(U.T @ U @ cov, np.eye(15), atol=1e-5)


def test_masked_steps_match_truncated():
    seq = sim.generate_sequence(num_frames=2, imu_hz=200.0)
    zeros = jnp.zeros(3, dtype=jnp.float64)
    acc, gyr, dt = _interval(seq, 0, 1, 20)
    n = dt.shape[0]
    # integrate only first half, via mask vs via truncation
    half = n // 2
    mask = jnp.arange(n) < half
    p_mask = pre.preintegrate(acc, gyr, dt, zeros, zeros, valid_mask=mask)
    p_trunc = pre.preintegrate(acc[:half + 1], gyr[:half + 1], dt[:half],
                               zeros, zeros)
    np.testing.assert_allclose(np.asarray(p_mask.delta_p),
                               np.asarray(p_trunc.delta_p), atol=1e-12)
    np.testing.assert_allclose(np.asarray(p_mask.covariance),
                               np.asarray(p_trunc.covariance), atol=1e-12)


def test_propagate_state_tracks_truth():
    seq = sim.generate_sequence(num_frames=3, imu_hz=1000.0)
    _, _, v0 = sim.state_at(seq.frame_times[0])
    p, q, v = seq.gt_p[0], seq.gt_q[0], v0
    zeros = jnp.zeros(3, dtype=jnp.float64)
    for k in range(200):
        dt = seq.imu_times[k + 1] - seq.imu_times[k]
        p, q, v = pre.propagate_state(p, q, v, zeros, zeros,
                                      seq.acc[k], seq.gyr[k],
                                      seq.acc[k + 1], seq.gyr[k + 1], dt)
    t_end = seq.imu_times[200]
    p_true, q_true, v_true = sim.state_at(t_end)
    np.testing.assert_allclose(np.asarray(p), np.asarray(p_true), atol=5e-4)
    np.testing.assert_allclose(np.asarray(v), np.asarray(v_true), atol=5e-4)


def test_associative_matches_sequential_scan():
    """The scan-free preintegrate must reproduce the per-step midpoint
    recursion (deltas, 15x15 jacobian AND covariance), including masked
    padding steps with garbage samples."""
    seq = sim.generate_sequence(num_frames=3, imu_hz=200.0,
                                acc_noise=0.1, gyr_noise=0.01)
    acc, gyr, dt = _interval(seq, 0, 2, 20)
    ba = jnp.asarray([0.02, -0.01, 0.03])
    bg = jnp.asarray([0.003, 0.001, -0.002])

    # padded buffer: 40 real steps + 24 masked garbage steps
    C = 64
    n = dt.shape[0]
    accp = jnp.concatenate([acc, jnp.full((C - n, 3), jnp.nan)], 0)
    gyrp = jnp.concatenate([gyr, jnp.full((C - n, 3), jnp.nan)], 0)
    dtp = jnp.concatenate([dt, jnp.full((C - n,), 123.0)], 0)
    mask = jnp.arange(C) < n

    pa = pre.preintegrate(accp, gyrp, dtp, ba, bg, valid_mask=mask)
    ps = pre.preintegrate_sequential(acc, gyr, dt, ba, bg)
    np.testing.assert_allclose(np.asarray(pa.delta_p),
                               np.asarray(ps.delta_p), atol=1e-10)
    np.testing.assert_allclose(np.asarray(pa.delta_q),
                               np.asarray(ps.delta_q), atol=1e-10)
    np.testing.assert_allclose(np.asarray(pa.delta_v),
                               np.asarray(ps.delta_v), atol=1e-10)
    np.testing.assert_allclose(np.asarray(pa.jacobian),
                               np.asarray(ps.jacobian), rtol=1e-8,
                               atol=1e-10)
    np.testing.assert_allclose(np.asarray(pa.covariance),
                               np.asarray(ps.covariance), rtol=1e-6,
                               atol=1e-14)
    assert np.isfinite(np.asarray(pa.covariance)).all()
    np.testing.assert_allclose(float(pa.sum_dt), float(ps.sum_dt),
                               rtol=1e-12)
