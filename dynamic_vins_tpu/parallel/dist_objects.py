"""Object-block parallelism: per-object BA sharded across the mesh.

BASELINE.json north star: per-object landmark blocks partitioned
host-wise. Each object's window problem is independent (loosely
coupled, estimator_insts.cpp semantics), so the object axis shards
embarrassingly: `shard_map` over a mesh axis, `vmap`ped LM inside each
shard. With O objects on D devices each chip solves O/D problems; the
result is gathered back by the out_specs.

Object-track handoff between shards (objects entering/leaving a host's
partition) is a host-side re-slot between frames — the arrays are
re-sharded by the next call's in_specs (XLA inserts the all_to_all).
"""

from __future__ import annotations

import jax
from dynamic_vins_tpu.utils.precision import precise_jit
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dynamic_vins_tpu.factors.object_factors import ObjectWindow
from dynamic_vins_tpu.solver import object_solver as osv


def make_distributed_object_solver(mesh: Mesh,
                                   cfg: osv.ObjectSolverConfig,
                                   axis: str = "obj"):
    """Returns solve_fn(states, lms, probs, active) with the leading
    object axis sharded over `axis`."""

    def _solve_shard(states, lms, probs, active):
        return jax.vmap(
            lambda s, l, p, a: osv.solve_one(s, l, p, cfg, a)
        )(states, lms, probs, active)

    spec = P(axis)
    state_specs = jax.tree.map(lambda _: spec, ObjectWindow(
        *([0] * len(ObjectWindow._fields))))
    prob_specs = jax.tree.map(lambda _: spec, osv.ObjectProblem(
        *([0] * len(osv.ObjectProblem._fields))))

    mapped = jax.shard_map(
        _solve_shard, mesh=mesh,
        in_specs=(state_specs, spec, prob_specs, spec),
        out_specs=(state_specs, spec, spec),
        check_vma=False)
    return precise_jit(mapped)


def shard_objects(mesh: Mesh, states, lms, probs, active,
                  axis: str = "obj"):
    """Device-put the object batch with the solver's sharding."""
    sh = NamedSharding(mesh, P(axis))
    put = lambda x: jax.device_put(x, sh)
    return (jax.tree.map(put, states), put(lms),
            jax.tree.map(put, probs), put(active))
