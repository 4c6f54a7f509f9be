"""Distributed BA on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from dynamic_vins_tpu.parallel import dist_ba
from dynamic_vins_tpu.sim import ba_problems
from dynamic_vins_tpu.solver import gauss_newton as gn


@pytest.fixture(scope="module")
def mesh():
    devs = np.array(jax.devices()[:8])
    return Mesh(devs, axis_names=("lm",))


def test_distributed_matches_single_device(mesh):
    ba = ba_problems.build(num_frames=5, num_landmarks=80,
                           obs_capacity=4096)
    state0 = ba_problems.perturb_state(ba.gt_state, pos_sigma=0.05,
                                       rot_sigma=0.02, seed=3)
    cfg = gn.SolverConfig(use_imu=True, max_iters=8)

    st_ref, dep_ref, info_ref = gn.solve(state0, ba.gt_inv_depth,
                                         ba.problem, cfg)

    solver = dist_ba.make_distributed_solver(mesh, ba.problem, cfg)
    problem_sharded = dist_ba.shard_problem(ba.problem, mesh)
    st_d, dep_d, info_d = solver(state0, ba.gt_inv_depth, problem_sharded)

    np.testing.assert_allclose(np.asarray(st_d.p), np.asarray(st_ref.p),
                               atol=1e-8)
    np.testing.assert_allclose(float(info_d.final_cost),
                               float(info_ref.final_cost), rtol=1e-6)


def test_distributed_converges_to_ground_truth(mesh):
    ba = ba_problems.build(num_frames=5, num_landmarks=80,
                           obs_capacity=4096)
    state0 = ba_problems.perturb_state(ba.gt_state, pos_sigma=0.08,
                                       rot_sigma=0.03, seed=5)
    cfg = gn.SolverConfig(use_imu=True, max_iters=12)
    solver = dist_ba.make_distributed_solver(mesh, ba.problem, cfg)
    st, dep, info = solver(state0, ba.gt_inv_depth,
                           dist_ba.shard_problem(ba.problem, mesh))
    perr = np.max(np.linalg.norm(np.asarray(st.p - ba.gt_state.p), -1))
    assert perr < 5e-3, perr
