"""Object-block sharding on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from dynamic_vins_tpu.geometry import lie
from dynamic_vins_tpu.parallel import dist_objects
from dynamic_vins_tpu.solver.object_solver import (ObjectSolverConfig,
                                                   solve_all)


@pytest.fixture(scope="module")
def mesh():
    return Mesh(np.array(jax.devices()[:8]), axis_names=("obj",))


def test_sharded_objects_match_single_device(mesh, rng):
    import sys
    sys.path.insert(0, __file__.rsplit("/", 1)[0])
    from test_object_solver import _make_moving_object

    gt, pts_obj, prob = _make_moving_object()
    O = 8
    stack = lambda x: jnp.stack([x] * O)
    states = jax.tree.map(stack, gt)
    probs = jax.tree.map(stack, prob)
    lms = stack(pts_obj)
    active = jnp.asarray([True] * 6 + [False] * 2)
    d = jnp.asarray(rng.normal(scale=0.03, size=(O, 6, 6)))
    p0, q0 = lie.pose_boxplus(states.p, states.q, d)
    states = states._replace(p=p0, q=q0)

    cfg = ObjectSolverConfig(max_iters=6)
    st_ref, lm_ref, cost_ref = solve_all(states, lms, probs, cfg,
                                         active)

    solver = dist_objects.make_distributed_object_solver(mesh, cfg)
    args = dist_objects.shard_objects(mesh, states, lms, probs, active)
    st_d, lm_d, cost_d = solver(*args)

    np.testing.assert_allclose(np.asarray(st_d.p), np.asarray(st_ref.p),
                               atol=1e-9)
    np.testing.assert_allclose(np.asarray(cost_d),
                               np.asarray(cost_ref), rtol=1e-9)
