"""Pose-graph optimization (loop-closure backend).

The reference ships no loop-closure module (SURVEY.md §2 — VINS-Fusion's
pose-graph package is not part of dynamic_vins); BASELINE.json's north
star asks for one as a distributed phase. Design: SE(3) nodes, relative
pose edges with per-edge sqrt-information, residual
r_ij = log(T_rel^-1 ∘ (T_i^-1 ∘ T_j)), robustified LM with jacfwd
Jacobians — edges vmapped, the normal equations assembled by scatter
into a dense [6K,6K] system (K poses), Jacobi-preconditioned Cholesky.

Distributed variant: parallel/dist_pose_graph.py shards the edge set
and psums the normal equations (same pattern as dist_ba).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from dynamic_vins_tpu.geometry import lie


class PoseGraph(NamedTuple):
    """Fixed-capacity pose graph (one pytree)."""

    p: jnp.ndarray          # [K,3] node positions
    q: jnp.ndarray          # [K,4] node orientations
    node_valid: jnp.ndarray  # [K]
    edge_i: jnp.ndarray     # [E] int32
    edge_j: jnp.ndarray     # [E]
    rel_p: jnp.ndarray      # [E,3] measured T_i^-1 T_j translation
    rel_q: jnp.ndarray      # [E,4]
    sqrt_info: jnp.ndarray  # [E,6,6] (or scaled identity)
    edge_valid: jnp.ndarray  # [E]
    fixed: jnp.ndarray      # [K] bool — gauge anchors


class PgoConfig(NamedTuple):
    max_iters: int = 12
    init_lambda: float = 1e-6
    lambda_up: float = 4.0
    lambda_down: float = 0.5
    huber_delta: float = 1.0
    ridge: float = 1e-9


def edge_residual(p_i, q_i, p_j, q_j, rel_p, rel_q, sqrt_info):
    """6-dim whitened relative-pose residual."""
    p_ij, q_ij = lie.pose_compose(*lie.pose_inverse(p_i, q_i), p_j, q_j)
    dp = p_ij - rel_p
    dq = lie.quat_log(lie.quat_multiply(lie.quat_conjugate(rel_q),
                                        q_ij))
    return sqrt_info @ jnp.concatenate([dp, dq])


def _edge_local(delta, graph: PoseGraph, e):
    """Residual of edge e at tangent perturbation [12] of its nodes."""
    i = graph.edge_i[e]
    j = graph.edge_j[e]
    p_i, q_i = lie.pose_boxplus(graph.p[i], graph.q[i], delta[:6])
    p_j, q_j = lie.pose_boxplus(graph.p[j], graph.q[j], delta[6:12])
    return edge_residual(p_i, q_i, p_j, q_j, graph.rel_p[e],
                         graph.rel_q[e], graph.sqrt_info[e])


def build_normal_equations(graph: PoseGraph, config: PgoConfig):
    """Dense [6K,6K] GN system from all edges (vmapped jacfwd)."""
    K = graph.p.shape[0]
    E = graph.edge_i.shape[0]
    D = 6 * K
    dtype = graph.p.dtype

    def one(e):
        zero = jnp.zeros((12,), dtype)
        r = _edge_local(zero, graph, e)
        J = jax.jacrev(_edge_local)(zero, graph, e)
        return r, J

    r, J = jax.vmap(one)(jnp.arange(E, dtype=jnp.int32))
    valid = graph.edge_valid
    # huber
    r2 = jnp.sum(r * r, axis=-1)
    w = jnp.where(r2 <= config.huber_delta ** 2, 1.0,
                  jnp.sqrt(config.huber_delta
                           / jnp.sqrt(jnp.maximum(r2, 1e-18))))
    w = jnp.where(valid, w, 0.0)
    r = r * w[:, None]
    J = J * w[:, None, None]
    cost = 0.5 * jnp.sum(r2 * jnp.where(valid, 1.0, 0.0))

    base = jnp.arange(6, dtype=jnp.int32)
    cols = jnp.concatenate([
        6 * graph.edge_i[:, None] + base[None, :],
        6 * graph.edge_j[:, None] + base[None, :]], axis=1)  # [E,12]
    Jd = jnp.zeros((E * 6, D), dtype)
    row_idx = (jnp.arange(E)[:, None, None] * 6
               + jnp.arange(6)[None, :, None])
    col_idx = jnp.broadcast_to(cols[:, None, :], (E, 6, 12))
    Jd = Jd.at[row_idx, col_idx].add(J)
    rf = r.reshape(E * 6)

    # gauge: zero columns of fixed nodes
    free = ~jnp.repeat(graph.fixed, 6)
    Jd = Jd * free[None, :].astype(dtype)
    H = Jd.T @ Jd
    b = Jd.T @ rf
    return H, b, cost, free


def solve(graph: PoseGraph, config: PgoConfig = PgoConfig()):
    """LM over the whole graph; returns (graph, info dict)."""
    K = graph.p.shape[0]
    dtype = graph.p.dtype

    def cost_of(g):
        _, _, c, _ = build_normal_equations(g, config)
        return c

    def step(carry, _):
        g, lam, cost = carry
        H, b, _, free = build_normal_equations(g, config)
        diag = jnp.diag(H)
        damped = diag * (1.0 + lam) + config.ridge
        damped = jnp.where(free & (diag > 0), damped, 1.0)
        H = H + jnp.diag(damped - diag)
        scale = 1.0 / jnp.sqrt(jnp.maximum(jnp.diag(H), 1e-18))
        Hs = H * scale[:, None] * scale[None, :]
        cho, low = jax.scipy.linalg.cho_factor(Hs, lower=True)
        delta = -scale * jax.scipy.linalg.cho_solve((cho, low),
                                                    scale * b)
        delta = jnp.where(free, delta, 0.0).reshape(K, 6)
        p2, q2 = lie.pose_boxplus(g.p, g.q, delta)
        g2 = g._replace(p=p2, q=q2)
        new_cost = cost_of(g2)
        accept = (new_cost < cost) & jnp.isfinite(new_cost)
        lam2 = jnp.clip(jnp.where(accept, lam * config.lambda_down,
                                  lam * config.lambda_up), 1e-12, 1e10)
        sel = lambda a, c: jax.tree.map(
            lambda x, y: jnp.where(accept, x, y), a, c)
        return (sel(g2, g), lam2,
                jnp.where(accept, new_cost, cost)), accept

    init_cost = cost_of(graph)
    (g, lam, cost), acc = jax.lax.scan(
        step, (graph, jnp.asarray(config.init_lambda, dtype),
               init_cost), None, length=config.max_iters)
    return g, {"initial_cost": init_cost, "final_cost": cost}


def make_graph(positions, quats, edges, rel_poses, capacity_nodes=None,
               capacity_edges=None, info_scale=1.0, fixed_nodes=(0,),
               dtype=jnp.float64):
    """Host helper to build a fixed-capacity PoseGraph."""
    import numpy as np

    K = len(positions)
    E = len(edges)
    Kc = capacity_nodes or K
    Ec = capacity_edges or E
    p = np.zeros((Kc, 3)); p[:K] = np.asarray(positions)
    q = np.tile([1.0, 0, 0, 0], (Kc, 1)); q[:K] = np.asarray(quats)
    nv = np.zeros(Kc, bool); nv[:K] = True
    ei = np.zeros(Ec, np.int32)
    ej = np.zeros(Ec, np.int32)
    rp = np.zeros((Ec, 3))
    rq = np.tile([1.0, 0, 0, 0], (Ec, 1))
    si = np.tile(np.eye(6) * info_scale, (Ec, 1, 1))
    ev = np.zeros(Ec, bool)
    for k, ((i, j), (tp, tq)) in enumerate(zip(edges, rel_poses)):
        ei[k] = i; ej[k] = j
        rp[k] = np.asarray(tp); rq[k] = np.asarray(tq)
        ev[k] = True
    fixed = np.zeros(Kc, bool)
    for f in fixed_nodes:
        fixed[f] = True
    return PoseGraph(jnp.asarray(p, dtype), jnp.asarray(q, dtype),
                     jnp.asarray(nv), jnp.asarray(ei), jnp.asarray(ej),
                     jnp.asarray(rp, dtype), jnp.asarray(rq, dtype),
                     jnp.asarray(si, dtype), jnp.asarray(ev),
                     jnp.asarray(fixed))
