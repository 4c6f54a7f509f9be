"""Pose-graph optimization (loop closure), single and multi-device."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from dynamic_vins_tpu.geometry import lie, lie_np
from dynamic_vins_tpu.parallel import dist_pose_graph
from dynamic_vins_tpu.solver import pose_graph as pg


def _ring_world(K=24, drift=0.02, seed=0):
    """Ground-truth ring of poses + odometry edges with drift + one
    loop-closure edge (the classic PGO benchmark shape)."""
    rng = np.random.default_rng(seed)
    gt_p, gt_q = [], []
    for k in range(K):
        th = 2 * np.pi * k / K
        gt_p.append([5 * np.cos(th), 5 * np.sin(th), 0.1 * np.sin(th)])
        gt_q.append(np.asarray(lie.quat_from_yaw(
            jnp.asarray(th + np.pi / 2))))
    gt_p = np.asarray(gt_p)
    gt_q = np.asarray(gt_q)

    def rel(i, j, noisy):
        p_ij, q_ij = lie_np.pose_compose(
            *lie_np.pose_inverse(gt_p[i], gt_q[i]), gt_p[j], gt_q[j])
        if noisy:
            p_ij = p_ij + rng.normal(scale=drift, size=3)
            dq = np.asarray(lie.so3_exp_quat(jnp.asarray(
                rng.normal(scale=drift, size=3))))
            q_ij = lie_np.quat_multiply(q_ij, dq)
        return p_ij, q_ij

    edges = [(k, k + 1) for k in range(K - 1)] + [(K - 1, 0)]
    rels = [rel(i, j, True) for (i, j) in edges[:-1]] + \
        [rel(K - 1, 0, False)]     # loop closure edge, accurate

    # initial guess: integrate the noisy odometry (drifts)
    init_p = [gt_p[0]]
    init_q = [gt_q[0]]
    for k in range(K - 1):
        tp, tq = rels[k]
        p2, q2 = lie_np.pose_compose(init_p[-1], init_q[-1], tp, tq)
        init_p.append(p2)
        init_q.append(q2)
    return (np.asarray(init_p), np.asarray(init_q), edges, rels,
            gt_p, gt_q)


def test_pgo_closes_the_loop():
    init_p, init_q, edges, rels, gt_p, gt_q = _ring_world()
    drift0 = np.linalg.norm(init_p[-1] - gt_p[-1])
    assert drift0 > 0.1   # odometry has drifted

    graph = pg.make_graph(init_p, init_q, edges, rels)
    out, info = pg.solve(graph)
    assert float(info["final_cost"]) < float(info["initial_cost"])
    err = np.linalg.norm(np.asarray(out.p)[: len(gt_p)] - gt_p, axis=1)
    # posterior error stays bounded by the per-edge noise (no longer
    # accumulating like the raw odometry did)
    assert err.max() < 0.25, err.max()
    init_err = np.linalg.norm(init_p - gt_p, axis=1)
    assert err.max() < init_err.max()


def test_distributed_pgo_matches(rng):
    init_p, init_q, edges, rels, gt_p, gt_q = _ring_world(K=16)
    graph = pg.make_graph(init_p, init_q, edges, rels,
                          capacity_edges=16)
    cfg = pg.PgoConfig(max_iters=8)
    ref, info = pg.solve(graph, cfg)

    mesh = Mesh(np.array(jax.devices()[:8]), axis_names=("edge",))
    solver = dist_pose_graph.make_distributed_pgo(mesh, cfg)
    sharded = dist_pose_graph.shard_graph(graph, mesh)
    out, c0, c1 = solver(sharded)
    np.testing.assert_allclose(np.asarray(out.p), np.asarray(ref.p),
                               atol=1e-8)
    np.testing.assert_allclose(float(c1), float(info["final_cost"]),
                               rtol=1e-8)
