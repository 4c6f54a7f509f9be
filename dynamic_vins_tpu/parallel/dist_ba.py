"""Distributed sliding-window BA over a device mesh.

The reference is single-process (SURVEY.md §2: threads + queues only);
this module is the new-design scale-out mandated by BASELINE.json's
north star: projection AND line factor rows (the dominant cost) are
sharded across devices, each device builds its partial Gauss-Newton
system, the camera-block reduction runs over `psum` (ICI collectives),
and the small Schur-complement solve (178×178 + 4×4 line blocks) is
replicated. Landmark back-substitution stays local to each shard.

Implementation: `shard_map` over a 1-D mesh axis; the LM trust loop
runs inside the mapped function so the whole multi-chip solve is ONE
jitted computation with no host round-trips between iterations. The
factor assembly itself is `gauss_newton.build_normal_equations` with
`axis=`/`n_shards=` — the distributed solver shares every line of
factor code with the production single-chip path.

This module is also the ENGINE's solve stage: `sharded_solve_score`
is the drop-in distributed replacement for the estimator megastep's
fused solve+score dispatch (`Estimator._build_jits`), so a `VioConfig`
with `devices > 1` runs the whole production frame loop multi-device.
"""

from __future__ import annotations

import jax
from dynamic_vins_tpu.utils.precision import precise_jit
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dynamic_vins_tpu.factors import projection
from dynamic_vins_tpu.solver import gauss_newton as gn


def _obs_spec(axis):
    return projection.ProjObs(
        frame_i=P(axis), frame_j=P(axis), cam_j=P(axis), lm=P(axis),
        pt_i=P(axis), pt_j=P(axis), vel_i=P(axis), vel_j=P(axis),
        td_ref=P(axis), valid=P(axis))


def _problem_spec(problem_template: gn.BAProblem, axis):
    """Sharding spec: obs + line rows sharded, everything else
    replicated."""
    line_obs_spec = None
    if problem_template.line_obs is not None:
        from dynamic_vins_tpu.factors.line_factor import LineObs

        line_obs_spec = LineObs(frame_j=P(axis), cam_j=P(axis),
                                line=P(axis), s=P(axis), e=P(axis),
                                valid=P(axis))
    line_valid_spec = None if problem_template.line_valid is None else P()
    return gn.BAProblem(
        obs=_obs_spec(axis),
        pres=jax.tree.map(lambda _: P(), problem_template.pres),
        imu_valid=P(),
        prior=jax.tree.map(lambda _: P(), problem_template.prior),
        lm_valid=P(), fixed_cols=P(),
        line_obs=line_obs_spec, line_valid=line_valid_spec)


def make_distributed_solver(mesh: Mesh, problem_template: gn.BAProblem,
                            config: gn.SolverConfig, axis: str = "lm",
                            with_lines: bool = False):
    """Build a jitted multi-device LM solver.

    The observation table (and, with_lines, the line observation table)
    is sharded along its row axis over `axis`; state / landmark arrays
    are replicated. Returns
    solve_fn(state, inv_depth, problem[, line_orth]) ->
    (state, inv_depth[, line_orth], info).
    """
    n_shards = mesh.shape[axis]
    problem_spec = _problem_spec(problem_template, axis)
    state_spec = jax.tree.map(lambda _: P(),
                              gn.layout.WindowState.identity(2))

    if with_lines:
        def _solve_sharded(state, inv_depth, problem, line_orth):
            return gn.solve(state, inv_depth, problem, config,
                            line_orth=line_orth, axis=axis,
                            n_shards=n_shards)

        in_specs = (state_spec, P(), problem_spec, P())
        out_specs = (state_spec, P(), P(),
                     gn.SolveInfo(P(), P(), P(), P()))
    else:
        def _solve_sharded(state, inv_depth, problem):
            return gn.solve(state, inv_depth, problem, config,
                            axis=axis, n_shards=n_shards)

        in_specs = (state_spec, P(), problem_spec)
        out_specs = (state_spec, P(),
                     gn.SolveInfo(P(), P(), P(), P()))

    mapped = jax.shard_map(
        _solve_sharded, mesh=mesh, in_specs=in_specs,
        out_specs=out_specs, check_vma=False)
    return precise_jit(mapped)


def sharded_solve_score(state, inv_depth, problem, config, axis,
                        n_shards, line_orth=None):
    """Per-shard body of the megastep's fused solve+score: distributed
    LM solve + psum-reduced per-landmark (and per-line) outlier scores.

    Call inside a shard_map whose in_specs shard the obs/line rows; a
    drop-in for the single-device solve+score in
    `Estimator._build_jits` (estimator.py solve_score[_lines]).
    axis=None degrades to the plain single-device solve+score."""
    ps = (lambda x: x) if axis is None else \
        (lambda x: jax.lax.psum(x, axis))
    has_lines = line_orth is not None
    if has_lines:
        st, dep, orth, info = gn.solve(state, inv_depth, problem,
                                       config, line_orth=line_orth,
                                       axis=axis, n_shards=n_shards)
    else:
        st, dep, info = gn.solve(state, inv_depth, problem, config,
                                 axis=axis, n_shards=n_shards)
        orth = None

    r = projection.residual_only(st, dep, problem.obs, sqrt_info=1.0)
    err = jnp.linalg.norm(r, axis=-1)
    L = dep.shape[0]
    w = (problem.obs.valid
         & problem.lm_valid[problem.obs.lm]).astype(err.dtype)
    ssum = ps(jax.ops.segment_sum(err * w, problem.obs.lm,
                                  num_segments=L))
    n = ps(jax.ops.segment_sum(w, problem.obs.lm, num_segments=L))
    scores = ssum / jnp.maximum(n, 1.0)
    if not has_lines:
        return st, dep, info.final_cost, scores

    from dynamic_vins_tpu.factors import line_factor

    rl = line_factor.residual_only(st, orth, problem.line_obs,
                                   sqrt_info=1.0)
    lerr = jnp.mean(jnp.abs(rl), axis=-1)
    Lc = orth.shape[0]
    lw = (problem.line_obs.valid
          & problem.line_valid[problem.line_obs.line]).astype(lerr.dtype)
    lsum = ps(jax.ops.segment_sum(lerr * lw, problem.line_obs.line,
                                  num_segments=Lc))
    ln = ps(jax.ops.segment_sum(lw, problem.line_obs.line,
                                num_segments=Lc))
    lscores = lsum / jnp.maximum(ln, 1.0)
    return st, dep, info.final_cost, scores, orth, lscores


def shard_problem(problem: gn.BAProblem, mesh: Mesh, axis: str = "lm"):
    """Device-put the problem with the solver's expected shardings."""
    def put(x, spec):
        return jax.device_put(x, NamedSharding(mesh, spec))

    obs = jax.tree.map(lambda x: put(x, P(axis)), problem.obs)
    rest_spec = P()
    out = problem._replace(
        obs=obs,
        pres=jax.tree.map(lambda x: put(x, rest_spec), problem.pres),
        imu_valid=put(problem.imu_valid, rest_spec),
        prior=jax.tree.map(lambda x: put(x, rest_spec), problem.prior),
        lm_valid=put(problem.lm_valid, rest_spec),
        fixed_cols=put(problem.fixed_cols, rest_spec))
    if problem.line_obs is not None:
        out = out._replace(
            line_obs=jax.tree.map(lambda x: put(x, P(axis)),
                                  problem.line_obs),
            line_valid=put(problem.line_valid, rest_spec))
    return out
