import jax
import jax.numpy as jnp
import numpy as np

from dynamic_vins_tpu.sim import ba_problems
from dynamic_vins_tpu.solver import gauss_newton as gn


def _pose_err(state, gt):
    return (np.max(np.linalg.norm(np.asarray(state.p - gt.p), axis=-1)),
            np.max(np.abs(np.asarray(state.q - gt.q))))


def test_residuals_zero_at_ground_truth():
    ba = ba_problems.build(num_frames=5, num_landmarks=80)
    cfg = gn.SolverConfig(use_imu=True)
    cost = gn.total_cost(ba.gt_state, ba.gt_inv_depth, ba.problem, cfg)
    assert float(cost) < 1e-3


def test_visual_only_ba_converges():
    ba = ba_problems.build(num_frames=5, num_landmarks=80)
    state0 = ba_problems.perturb_state(ba.gt_state, pos_sigma=0.08,
                                       rot_sigma=0.03, seed=3)
    dep0 = ba.gt_inv_depth * (1.0 + 0.1 * np.random.default_rng(4).normal(
        size=ba.gt_inv_depth.shape))
    dep0 = jnp.asarray(dep0)
    cfg = gn.SolverConfig(use_imu=False, max_iters=15)
    st, dep, info = gn.solve(state0, dep0, ba.problem, cfg)
    assert float(info.final_cost) < 1e-8
    perr, qerr = _pose_err(st, ba.gt_state)
    assert perr < 1e-4, perr
    assert qerr < 1e-5, qerr
    dep_err = np.abs(np.asarray(dep - ba.gt_inv_depth))
    assert np.max(dep_err[np.asarray(ba.problem.lm_valid)]) < 1e-5


def test_vio_ba_converges():
    ba = ba_problems.build(num_frames=5, num_landmarks=80)
    state0 = ba_problems.perturb_state(ba.gt_state, pos_sigma=0.05,
                                       rot_sigma=0.02, vel_sigma=0.1,
                                       seed=7)
    cfg = gn.SolverConfig(use_imu=True, max_iters=15)
    st, dep, info = gn.solve(state0, ba.gt_inv_depth, ba.problem, cfg)
    assert float(info.final_cost) < float(info.initial_cost) * 1e-3
    perr, _ = _pose_err(st, ba.gt_state)
    assert perr < 5e-3, perr
    # velocity recovered too
    verr = np.max(np.linalg.norm(np.asarray(st.v - ba.gt_state.v), -1))
    assert verr < 2e-2, verr


def test_solver_jits_and_is_deterministic():
    ba = ba_problems.build(num_frames=5, num_landmarks=60)
    state0 = ba_problems.perturb_state(ba.gt_state, seed=1)
    cfg = gn.SolverConfig(use_imu=True, max_iters=5)
    solve_jit = jax.jit(lambda s, d: gn.solve(s, d, ba.problem, cfg))
    st1, dep1, info1 = solve_jit(state0, ba.gt_inv_depth)
    st2, dep2, info2 = solve_jit(state0, ba.gt_inv_depth)
    np.testing.assert_array_equal(np.asarray(st1.p), np.asarray(st2.p))
    np.testing.assert_array_equal(np.asarray(info1.final_cost),
                                  np.asarray(info2.final_cost))


def test_noisy_observations_bounded_error():
    ba = ba_problems.build(num_frames=5, num_landmarks=100,
                           pixel_noise=1.0, seed=5)
    state0 = ba_problems.perturb_state(ba.gt_state, pos_sigma=0.05,
                                       rot_sigma=0.02, seed=6)
    cfg = gn.SolverConfig(use_imu=True, max_iters=15)
    st, dep, info = gn.solve(state0, ba.gt_inv_depth, ba.problem, cfg)
    perr, _ = _pose_err(st, ba.gt_state)
    # 1px noise on ~460px focal -> cm-level window error is acceptable
    assert perr < 0.05, perr


def test_invalid_rows_do_not_contribute():
    ba = ba_problems.build(num_frames=5, num_landmarks=60)
    # flip all valid off: cost must be exactly the imu+prior part,
    # and solving must leave the state unchanged except via imu
    problem = ba.problem._replace(
        obs=ba.problem.obs._replace(
            valid=jnp.zeros_like(ba.problem.obs.valid)),
        lm_valid=jnp.zeros_like(ba.problem.lm_valid))
    cfg = gn.SolverConfig(use_imu=False, max_iters=3)
    cost = gn.total_cost(ba.gt_state, ba.gt_inv_depth, problem, cfg)
    assert float(cost) == 0.0
    st, dep, info = gn.solve(ba.gt_state, ba.gt_inv_depth, problem, cfg)
    assert np.all(np.isfinite(np.asarray(st.p)))
    np.testing.assert_allclose(np.asarray(dep),
                               np.asarray(ba.gt_inv_depth), atol=1e-12)


def test_plane_constraint_fixes_z_roll_pitch():
    """Planar-motion mode (PoseConstraint/SpeedConstraint local
    parameterizations, factor/pose_local_parameterization.h:38-50):
    z, roll, pitch, vz are never updated by the solve."""
    from dynamic_vins_tpu.solver import layout

    ba = ba_problems.build(num_frames=5, num_landmarks=80)
    F = 5
    fixed = np.asarray(ba.problem.fixed_cols)
    fixed = fixed | layout.plane_constraint_cols(F)
    problem = ba.problem._replace(fixed_cols=jnp.asarray(fixed))
    state0 = ba_problems.perturb_state(ba.gt_state, pos_sigma=0.05,
                                       rot_sigma=0.02, seed=11)
    cfg = gn.SolverConfig(use_imu=True, max_iters=8)
    st, dep, info = gn.solve(state0, ba.gt_inv_depth, problem, cfg)
    assert float(info.final_cost) < float(info.initial_cost)
    # constrained dims unchanged from the initial state
    np.testing.assert_allclose(np.asarray(st.p[:, 2]),
                               np.asarray(state0.p[:, 2]), atol=1e-12)
    np.testing.assert_allclose(np.asarray(st.v[:, 2]),
                               np.asarray(state0.v[:, 2]), atol=1e-12)
    # roll/pitch tangent fixed: the q delta about x/y is zero
    from dynamic_vins_tpu.geometry import lie
    dth = np.asarray(lie.quat_log(lie.quat_multiply(
        lie.quat_conjugate(jnp.asarray(state0.q)), st.q)))
    np.testing.assert_allclose(dth[:, 0], 0.0, atol=1e-10)
    np.testing.assert_allclose(dth[:, 1], 0.0, atol=1e-10)
    # free dims did move
    assert np.max(np.abs(np.asarray(st.p[:, :2] - state0.p[:, :2]))) > 1e-6


def test_assembled_proj_rows_match_scatter():
    # the scatter-free one-hot assembly must reproduce the scatter
    # result exactly (both are two-term adds per element)
    from dynamic_vins_tpu.factors import projection
    from dynamic_vins_tpu.solver import layout

    ba = ba_problems.build(num_frames=5, num_landmarks=40,
                           obs_capacity=256, lm_capacity=64, seed=3)
    st = ba.gt_state
    r, j_cam, j_dep, cols = projection.evaluate(st, ba.gt_inv_depth,
                                                ba.problem.obs)
    D = layout.cam_dim(5)
    a = gn._scatter_rows(j_cam, cols, 2, D)
    b = gn._assemble_proj_rows(j_cam, ba.problem.obs, 5, D)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=0, atol=1e-12)
