"""Distributed sliding-window BA over a device mesh.

The reference is single-process (SURVEY.md §2: threads + queues only);
this module is the new-design scale-out mandated by BASELINE.json's
north star: projection-factor rows (the dominant cost) are sharded
across devices, each device builds its partial Gauss-Newton system, the
camera-block reduction runs over `psum` (ICI collectives), and the small
Schur-complement solve (178×178) is replicated. Landmark back-
substitution stays local to each shard.

Implementation: `shard_map` over a 1-D mesh axis; the LM trust loop runs
inside the mapped function so the whole multi-chip solve is ONE jitted
computation with no host round-trips between iterations.
"""

from __future__ import annotations

from functools import partial

import jax
from dynamic_vins_tpu.utils.precision import precise_jit
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dynamic_vins_tpu.factors import imu_factor, prior as prior_factor
from dynamic_vins_tpu.factors import projection
from dynamic_vins_tpu.solver import gauss_newton as gn


def _local_normal_equations(state, inv_depth, problem, config, axis,
                            n_shards):
    """Per-shard normal equations; obs rows are the sharded leaf."""
    D = gn.layout.cam_dim(state.num_frames)
    L = inv_depth.shape[0]
    dtype = state.p.dtype

    r_p, j_cam, j_dep, cols = projection.evaluate(state, inv_depth,
                                                  problem.obs)
    obs_valid = problem.obs.valid & problem.lm_valid[problem.obs.lm]
    r_p = jnp.where(obs_valid[:, None], r_p, 0.0)
    j_cam = jnp.where(obs_valid[:, None, None], j_cam, 0.0)
    j_dep = jnp.where(obs_valid[:, None], j_dep, 0.0)

    r2 = jnp.sum(r_p * r_p, axis=-1)
    w = gn._huber_weight(r2, config.huber_delta)[:, None]
    cost = 0.5 * jnp.sum(
        jnp.where(obs_valid, gn._huber_cost(r2, config.huber_delta), 0.0))
    r_p = r_p * w
    j_cam = j_cam * w[..., None]
    j_dep = j_dep * w

    N = r_p.shape[0]
    J_proj = gn._assemble_proj_rows(j_cam, problem.obs,
                                    state.num_frames, D)
    r_proj = r_p.reshape(2 * N)
    jl = j_dep.reshape(2 * N)
    lm_flat = jnp.repeat(problem.obs.lm, 2)

    H_ll = jax.ops.segment_sum(jl * jl, lm_flat, num_segments=L)
    H_lc = jax.ops.segment_sum(jl[:, None] * J_proj, lm_flat,
                               num_segments=L)
    b_l = jax.ops.segment_sum(jl * r_proj, lm_flat, num_segments=L)

    # IMU + prior evaluated on every shard, scaled by 1/sqrt(n) so the
    # psum reconstructs them exactly once
    s = 1.0 / jnp.sqrt(jnp.asarray(n_shards, dtype))
    if config.use_imu:
        r_i, J_i, cols_i = imu_factor.evaluate(state, problem.pres,
                                               problem.imu_valid)
        E = r_i.shape[0]
        J_imu = gn._scatter_rows(J_i, cols_i, 15, D) * s
        r_imu = r_i.reshape(15 * E) * s
    else:
        J_imu = jnp.zeros((0, D), dtype)
        r_imu = jnp.zeros((0,), dtype)
    r_pr, J_pr = prior_factor.evaluate(state, problem.prior)
    r_pr = r_pr * s
    J_pr = J_pr * s
    cost = cost + 0.5 * jnp.sum(r_imu * r_imu) + 0.5 * jnp.sum(r_pr * r_pr)

    J_all = jnp.concatenate([J_proj, J_imu, J_pr], axis=0)
    r_all = jnp.concatenate([r_proj, r_imu, r_pr], axis=0)
    free = (~problem.fixed_cols).astype(dtype)
    J_all = J_all * free[None, :]
    H_lc = H_lc * free[None, :]

    H_cc = J_all.T @ J_all
    b_c = J_all.T @ r_all

    # ICI reduction of the camera block + landmark segments
    H_cc = jax.lax.psum(H_cc, axis)
    b_c = jax.lax.psum(b_c, axis)
    H_ll = jax.lax.psum(H_ll, axis)
    H_lc = jax.lax.psum(H_lc, axis)
    b_l = jax.lax.psum(b_l, axis)
    cost = jax.lax.psum(cost, axis)
    return gn.NormalEquations(H_cc, b_c, H_ll, H_lc, b_l, cost)


def _local_cost(state, inv_depth, problem, config, axis, n_shards):
    r_p = projection.residual_only(state, inv_depth, problem.obs)
    obs_valid = problem.obs.valid & problem.lm_valid[problem.obs.lm]
    r2 = jnp.sum(r_p * r_p, axis=-1)
    cost = 0.5 * jnp.sum(
        jnp.where(obs_valid, gn._huber_cost(r2, config.huber_delta), 0.0))
    inv_n = 1.0 / jnp.asarray(n_shards, state.p.dtype)
    if config.use_imu:
        r_i = imu_factor.residual_only(state, problem.pres,
                                       problem.imu_valid)
        cost = cost + 0.5 * jnp.sum(r_i * r_i) * inv_n
    r_pr = prior_factor.residual_only(state, problem.prior)
    cost = cost + 0.5 * jnp.sum(r_pr * r_pr) * inv_n
    return jax.lax.psum(cost, axis)


def make_distributed_solver(mesh: Mesh, problem_template: gn.BAProblem,
                            config: gn.SolverConfig, axis: str = "lm"):
    """Build a jitted multi-device LM solver.

    The observation table is sharded along its row axis over `axis`;
    state / landmark arrays are replicated. Returns
    solve_fn(state, inv_depth, problem) -> (state, inv_depth, info).
    """
    n_shards = mesh.shape[axis]

    obs_spec = projection.ProjObs(
        frame_i=P(axis), frame_j=P(axis), cam_j=P(axis), lm=P(axis),
        pt_i=P(axis), pt_j=P(axis), vel_i=P(axis), vel_j=P(axis),
        td_ref=P(axis), valid=P(axis))
    problem_spec = gn.BAProblem(
        obs=obs_spec,
        pres=jax.tree.map(lambda _: P(), problem_template.pres),
        imu_valid=P(), prior=jax.tree.map(lambda _: P(),
                                          problem_template.prior),
        lm_valid=P(), fixed_cols=P())
    state_spec = jax.tree.map(lambda _: P(),
                              gn.layout.WindowState.identity(2))

    def _solve_sharded(state, inv_depth, problem):
        init_cost = _local_cost(state, inv_depth, problem, config, axis,
                                n_shards)

        def step(carry, _):
            st, dep, lam, cost = carry
            eq = _local_normal_equations(st, dep, problem, config, axis,
                                         n_shards)
            dc, dl, _ = gn.solve_damped(eq, problem.lm_valid,
                                        problem.fixed_cols, lam,
                                        config.ridge)
            new_st = st.boxplus(dc)
            new_dep = dep + dl
            new_cost = _local_cost(new_st, new_dep, problem, config,
                                   axis, n_shards)
            accept = (new_cost < cost) & jnp.isfinite(new_cost)
            lam_next = jnp.clip(
                jnp.where(accept, lam * config.lambda_down,
                          lam * config.lambda_up),
                config.min_lambda, config.max_lambda)
            sel = lambda a, b: jax.tree.map(
                lambda x, y: jnp.where(accept, x, y), a, b)
            return (sel(new_st, st), jnp.where(accept, new_dep, dep),
                    lam_next, jnp.where(accept, new_cost, cost)), accept

        lam0 = jnp.asarray(config.init_lambda, state.p.dtype)
        (st, dep, lam, cost), accepted = jax.lax.scan(
            step, (state, inv_depth, lam0, init_cost), None,
            length=config.max_iters)
        return st, dep, gn.SolveInfo(init_cost, cost, lam, accepted)

    mapped = jax.shard_map(
        _solve_sharded, mesh=mesh,
        in_specs=(state_spec, P(), problem_spec),
        out_specs=(state_spec, P(),
                   gn.SolveInfo(P(), P(), P(), P())),
        check_vma=False)
    return precise_jit(mapped)


def shard_problem(problem: gn.BAProblem, mesh: Mesh, axis: str = "lm"):
    """Device-put the problem with the solver's expected shardings."""
    def put(x, spec):
        return jax.device_put(x, NamedSharding(mesh, spec))

    obs = jax.tree.map(lambda x: put(x, P(axis)), problem.obs)
    rest_spec = P()
    return problem._replace(
        obs=obs,
        pres=jax.tree.map(lambda x: put(x, rest_spec), problem.pres),
        imu_valid=put(problem.imu_valid, rest_spec),
        prior=jax.tree.map(lambda x: put(x, rest_spec), problem.prior),
        lm_valid=put(problem.lm_valid, rest_spec),
        fixed_cols=put(problem.fixed_cols, rest_spec))
