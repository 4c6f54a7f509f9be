"""Distributed pose-graph optimization: edges sharded, psum reduction.

North-star phase: the loop-closure pose graph solved across the mesh.
Edges shard over the mesh axis; each device builds its partial normal
equations; the [6K,6K] reduction rides `psum`; the (small) solve is
replicated. Same pattern as dist_ba.
"""

from __future__ import annotations

import jax
from dynamic_vins_tpu.utils.precision import precise_jit
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dynamic_vins_tpu.geometry import lie
from dynamic_vins_tpu.solver import pose_graph as pg


def make_distributed_pgo(mesh: Mesh, config: pg.PgoConfig,
                         axis: str = "edge"):
    n = mesh.shape[axis]

    def _local_normal_eq(graph):
        H, b, cost, free = pg.build_normal_equations(graph, config)
        return (jax.lax.psum(H, axis), jax.lax.psum(b, axis),
                jax.lax.psum(cost, axis), free)

    def _solve(graph):
        K = graph.p.shape[0]
        dtype = graph.p.dtype

        def cost_of(g):
            _, _, c, _ = _local_normal_eq(g)
            return c

        def step(carry, _):
            g, lam, cost = carry
            H, b, _, free = _local_normal_eq(g)
            diag = jnp.diag(H)
            damped = diag * (1.0 + lam) + config.ridge
            damped = jnp.where(free & (diag > 0), damped, 1.0)
            H2 = H + jnp.diag(damped - diag)
            scale = 1.0 / jnp.sqrt(jnp.maximum(jnp.diag(H2), 1e-18))
            Hs = H2 * scale[:, None] * scale[None, :]
            cho, low = jax.scipy.linalg.cho_factor(Hs, lower=True)
            delta = -scale * jax.scipy.linalg.cho_solve((cho, low),
                                                        scale * b)
            delta = jnp.where(free, delta, 0.0).reshape(K, 6)
            p2, q2 = lie.pose_boxplus(g.p, g.q, delta)
            g2 = g._replace(p=p2, q=q2)
            new_cost = cost_of(g2)
            accept = (new_cost < cost) & jnp.isfinite(new_cost)
            lam2 = jnp.clip(
                jnp.where(accept, lam * config.lambda_down,
                          lam * config.lambda_up), 1e-12, 1e10)
            sel = lambda a, c: jax.tree.map(
                lambda x, y: jnp.where(accept, x, y), a, c)
            return (sel(g2, g), lam2,
                    jnp.where(accept, new_cost, cost)), accept

        init_cost = cost_of(graph)
        (g, lam, cost), _ = jax.lax.scan(
            step, (graph, jnp.asarray(config.init_lambda, dtype),
                   init_cost), None, length=config.max_iters)
        return g, init_cost, cost

    edge_fields = {"edge_i", "edge_j", "rel_p", "rel_q", "sqrt_info",
                   "edge_valid"}
    in_spec = pg.PoseGraph(**{
        f: P(axis) if f in edge_fields else P()
        for f in pg.PoseGraph._fields})
    node_spec = pg.PoseGraph(**{
        f: P(axis) if f in edge_fields else P()
        for f in pg.PoseGraph._fields})

    mapped = jax.shard_map(
        _solve, mesh=mesh,
        in_specs=(in_spec,),
        out_specs=(node_spec._replace(
            p=P(), q=P(), node_valid=P(), fixed=P()), P(), P()),
        check_vma=False)
    return precise_jit(mapped)


def shard_graph(graph: pg.PoseGraph, mesh: Mesh, axis: str = "edge"):
    edge_fields = {"edge_i", "edge_j", "rel_p", "rel_q", "sqrt_info",
                   "edge_valid"}
    out = {}
    for f in pg.PoseGraph._fields:
        v = getattr(graph, f)
        spec = P(axis) if f in edge_fields else P()
        out[f] = jax.device_put(v, NamedSharding(mesh, spec))
    return pg.PoseGraph(**out)
