"""Batched Levenberg–Marquardt BA solver with dense Schur complement.

Replaces the reference's Ceres DENSE_SCHUR + DOGLEG solve
(`estimator/estimator.cpp:261-340`) with a TPU-first design:

  * all factor residuals/Jacobians evaluated by `vmap`ed jacfwd kernels,
  * a dense camera-side Jacobian [M, Dc] built by scatter (Dc = 178 for
    the reference window of 11 frames) so H_cc = JᵀJ is one MXU matmul,
  * landmark columns kept implicit (each projection row touches exactly
    one inverse depth): H_ll is a segment-sum diagonal, H_lc a
    segment-sum of weighted J rows, and the Schur complement
    S = H_cc − H_lcᵀ D⁻¹ H_lc is again one matmul,
  * an LM trust loop as `lax.scan` with fixed iteration count (the
    reference budget is ≤10 iterations, kitti_tracking.yaml:70-71).

Everything is static-shaped; invalid rows/slots are masked.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from dynamic_vins_tpu.factors import imu_factor, prior as prior_factor
from dynamic_vins_tpu.factors import projection
from dynamic_vins_tpu.imu import preintegration as pre
from dynamic_vins_tpu.solver import layout


class BAProblem(NamedTuple):
    """All factor data for one window solve (a single pytree)."""

    obs: projection.ProjObs
    pres: pre.Preintegration          # batched [E = F-1]
    imu_valid: jnp.ndarray            # [E] bool
    prior: prior_factor.MarginalPrior
    lm_valid: jnp.ndarray             # [L] bool landmark slot validity
    fixed_cols: jnp.ndarray           # [Dc] bool — tangent dims held fixed
    # optional line-feature system (PL-VINS capability; None = no lines)
    line_obs: object = None           # factors.line_factor.LineObs | None
    line_valid: object = None         # [Lc] bool | None


class SolverConfig(NamedTuple):
    max_iters: int = 10
    init_lambda: float = 1e-4
    lambda_up: float = 4.0
    lambda_down: float = 0.5
    min_lambda: float = 1e-10
    max_lambda: float = 1e8
    huber_delta: float = 1.0          # on whitened projection residuals
    use_imu: bool = True
    ridge: float = 1e-8
    # relative weight of line factors vs points (scales LINE_SQRT_INFO);
    # <1 de-emphasizes lines in point-rich scenes (tuned default: see
    # tests/test_line_e2e.py)
    line_weight: float = 1.0


def _huber_weight(r2, delta):
    """Per-row IRLS weight sqrt(rho'(s)) for Ceres-style Huber."""
    s = jnp.sqrt(jnp.maximum(r2, 1e-20))
    return jnp.where(r2 <= delta * delta, 1.0, jnp.sqrt(delta / s))


def _huber_cost(r2, delta):
    d2 = delta * delta
    return jnp.where(r2 <= d2, r2, 2.0 * delta * jnp.sqrt(
        jnp.maximum(r2, 1e-20)) - d2)


def _scatter_rows(jacs, cols, n_rows_per_item, D):
    """Scatter per-item block Jacobians into a dense [items*rows, D]."""
    n, rows, k = jacs.shape
    out = jnp.zeros((n * rows, D), dtype=jacs.dtype)
    row_idx = (jnp.arange(n)[:, None, None] * rows
               + jnp.arange(rows)[None, :, None])
    col_idx = jnp.broadcast_to(cols[:, None, :], (n, rows, k))
    return out.at[row_idx, col_idx].add(jacs)


def _assemble_proj_rows(j_cam, obs, F, D):
    """Dense projection Jacobian [2N, D] without scatter.

    XLA lowers `at[].add` scatters to serialized updates on TPU — on
    the 8192-row reference problem the scatter was ~60% of an LM
    iteration. The projection factor's sparsity is block-structured
    (pose_i, pose_j, extrinsic cam0, extrinsic cam_j, td — layout.py
    column map), so the dense rows assemble from one-hot outer
    products + a concat: pure VPU broadcast-multiplies, no scatter.

    j_cam: [N,2,25] with blocks [0:6) dpose_i, [6:12) dpose_j,
    [12:18) dex_i (always cam 0), [18:24) dex_j (cam_j), [24] dtd.
    """
    n = j_cam.shape[0]
    dt = j_cam.dtype
    oh_i = jax.nn.one_hot(obs.frame_i, F, dtype=dt)          # [N,F]
    oh_j = jax.nn.one_hot(obs.frame_j, F, dtype=dt)
    pose = (j_cam[:, :, None, 0:6] * oh_i[:, None, :, None]
            + j_cam[:, :, None, 6:12] * oh_j[:, None, :, None])
    pose = pose.reshape(n, 2, 6 * F)
    sb = jnp.zeros((n, 2, 9 * F), dt)
    oh_c = jax.nn.one_hot(obs.cam_j, 2, dtype=dt)            # [N,2]
    # ex cam-0 block: anchor extrinsic always + observing when cam_j=0
    ex0 = j_cam[:, :, 12:18] + oh_c[:, None, 0:1] * j_cam[:, :, 18:24]
    ex1 = oh_c[:, None, 1:2] * j_cam[:, :, 18:24]
    td = j_cam[:, :, 24:25]
    J = jnp.concatenate([pose, sb, ex0, ex1, td], axis=-1)
    return J.reshape(2 * n, D)


class NormalEquations(NamedTuple):
    H_cc: jnp.ndarray    # [Dc, Dc]
    b_c: jnp.ndarray     # [Dc]
    H_ll: jnp.ndarray    # [L] diagonal
    H_lc: jnp.ndarray    # [L, Dc]
    b_l: jnp.ndarray     # [L]
    cost: jnp.ndarray    # [] robustified total cost
    # line blocks (4-dof orthonormal params, block-diagonal Schur)
    H_gg: object = None  # [Lc,4,4] | None
    H_gc: object = None  # [Lc,4,Dc] | None
    b_g: object = None   # [Lc,4] | None


def _line_normal_equations(state, line_orth, problem, config, D):
    """Line-factor contributions: camera rows + 4x4 line blocks."""
    from dynamic_vins_tpu.factors import line_factor

    Lc = line_orth.shape[0]
    dtype = state.p.dtype
    r_l, j_cam, j_orth, cols = line_factor.evaluate(
        state, line_orth, problem.line_obs,
        sqrt_info=line_factor.LINE_SQRT_INFO * config.line_weight)
    valid = problem.line_obs.valid & problem.line_valid[
        problem.line_obs.line]
    r_l = jnp.where(valid[:, None], r_l, 0.0)
    j_cam = jnp.where(valid[:, None, None], j_cam, 0.0)
    j_orth = jnp.where(valid[:, None, None], j_orth, 0.0)

    r2 = jnp.sum(r_l * r_l, axis=-1)
    w = _huber_weight(r2, config.huber_delta)[:, None]
    cost = 0.5 * jnp.sum(
        jnp.where(valid, _huber_cost(r2, config.huber_delta), 0.0))
    r_l = r_l * w
    j_cam = j_cam * w[..., None]
    j_orth = j_orth * w[..., None]

    N = r_l.shape[0]
    J_line = _scatter_rows(j_cam, cols, 2, D)          # [2N, D]
    r_line = r_l.reshape(2 * N)
    jg = j_orth.reshape(2 * N, 4)
    line_flat = jnp.repeat(problem.line_obs.line, 2)

    H_gg = jax.ops.segment_sum(jg[:, :, None] * jg[:, None, :],
                               line_flat, num_segments=Lc)
    H_gc = jax.ops.segment_sum(jg[:, :, None] * J_line[:, None, :],
                               line_flat, num_segments=Lc)
    b_g = jax.ops.segment_sum(jg * r_line[:, None], line_flat,
                              num_segments=Lc)
    return J_line, r_line, H_gg, H_gc, b_g, cost


def build_normal_equations(state: layout.WindowState, inv_depth,
                           problem: BAProblem,
                           config: SolverConfig,
                           line_orth=None, axis=None,
                           n_shards: int = 1) -> NormalEquations:
    """Assemble the Gauss-Newton system for one window.

    axis/n_shards: when called inside a `shard_map` over a device mesh
    with the observation rows (and line rows) sharded along `axis`,
    each shard builds its partial system from its local rows, the
    replicated IMU/prior rows are scaled by 1/sqrt(n_shards) so the
    reduction counts them exactly once, and every output block is
    `psum`-reduced over the ICI (the north-star distributed Schur:
    camera-block reduction over collectives, landmark back-substitution
    local). axis=None is the single-device path, byte-identical to
    before."""
    D = layout.cam_dim(state.num_frames)
    L = inv_depth.shape[0]
    dtype = state.p.dtype

    # --- projection factors -------------------------------------------
    r_p, j_cam, j_dep, cols = projection.evaluate(state, inv_depth,
                                                  problem.obs)
    obs_valid = problem.obs.valid & problem.lm_valid[problem.obs.lm]
    r_p = jnp.where(obs_valid[:, None], r_p, 0.0)
    j_cam = jnp.where(obs_valid[:, None, None], j_cam, 0.0)
    j_dep = jnp.where(obs_valid[:, None], j_dep, 0.0)

    r2 = jnp.sum(r_p * r_p, axis=-1)
    w = _huber_weight(r2, config.huber_delta)[:, None]
    cost_proj = 0.5 * jnp.sum(
        jnp.where(obs_valid, _huber_cost(r2, config.huber_delta), 0.0))
    r_p = r_p * w
    j_cam = j_cam * w[..., None]
    j_dep = j_dep * w

    N = r_p.shape[0]
    J_proj = _assemble_proj_rows(j_cam, problem.obs,
                                 state.num_frames, D)  # [2N, D]
    r_proj = r_p.reshape(2 * N)
    jl = j_dep.reshape(2 * N)
    lm_flat = jnp.repeat(problem.obs.lm, 2)

    H_ll = jax.ops.segment_sum(jl * jl, lm_flat, num_segments=L)
    H_lc = jax.ops.segment_sum(jl[:, None] * J_proj, lm_flat,
                               num_segments=L)
    b_l = jax.ops.segment_sum(jl * r_proj, lm_flat, num_segments=L)

    # --- IMU factors ---------------------------------------------------
    # replicated on every shard; 1/sqrt(n) row scale makes the psum
    # reconstruct them exactly once
    s_rep = 1.0 if axis is None else 1.0 / jnp.sqrt(
        jnp.asarray(n_shards, dtype))
    if config.use_imu:
        r_i, J_i, cols_i = imu_factor.evaluate(state, problem.pres,
                                               problem.imu_valid)
        E = r_i.shape[0]
        J_imu = _scatter_rows(J_i, cols_i, 15, D) * s_rep  # [15E, D]
        r_imu = r_i.reshape(15 * E) * s_rep
        cost_imu = 0.5 * jnp.sum(r_imu * r_imu)
    else:
        J_imu = jnp.zeros((0, D), dtype)
        r_imu = jnp.zeros((0,), dtype)
        cost_imu = jnp.zeros((), dtype)

    # --- marginalization prior ----------------------------------------
    r_pr, J_pr = prior_factor.evaluate(state, problem.prior)
    r_pr = r_pr * s_rep
    J_pr = J_pr * s_rep
    cost_prior = 0.5 * jnp.sum(r_pr * r_pr)

    # --- line factors (optional) --------------------------------------
    if problem.line_obs is not None and line_orth is not None:
        (J_line, r_line, H_gg, H_gc, b_g,
         cost_line) = _line_normal_equations(state, line_orth, problem,
                                             config, D)
    else:
        J_line = jnp.zeros((0, D), dtype)
        r_line = jnp.zeros((0,), dtype)
        H_gg = H_gc = b_g = None
        cost_line = jnp.zeros((), dtype)

    # --- assemble camera-side normal equations ------------------------
    J_all = jnp.concatenate([J_proj, J_imu, J_pr, J_line], axis=0)
    r_all = jnp.concatenate([r_proj, r_imu, r_pr, r_line], axis=0)

    # fixed tangent dims: zero their columns
    free = (~problem.fixed_cols).astype(dtype)
    J_all = J_all * free[None, :]
    H_lc = H_lc * free[None, :]
    if H_gc is not None:
        H_gc = H_gc * free[None, None, :]

    H_cc = J_all.T @ J_all
    b_c = J_all.T @ r_all

    cost = cost_proj + cost_imu + cost_prior + cost_line
    eq = NormalEquations(H_cc, b_c, H_ll, H_lc, b_l, cost,
                         H_gg, H_gc, b_g)
    if axis is not None:
        eq = jax.tree.map(lambda x: jax.lax.psum(x, axis), eq)
    return eq


def total_cost(state: layout.WindowState, inv_depth, problem: BAProblem,
               config: SolverConfig, line_orth=None, axis=None,
               n_shards: int = 1):
    inv_n = 1.0 if axis is None else 1.0 / jnp.asarray(
        n_shards, state.p.dtype)
    r_p = projection.residual_only(state, inv_depth, problem.obs)
    obs_valid = problem.obs.valid & problem.lm_valid[problem.obs.lm]
    r2 = jnp.sum(r_p * r_p, axis=-1)
    cost = 0.5 * jnp.sum(
        jnp.where(obs_valid, _huber_cost(r2, config.huber_delta), 0.0))
    if config.use_imu:
        r_i = imu_factor.residual_only(state, problem.pres,
                                       problem.imu_valid)
        cost = cost + 0.5 * jnp.sum(r_i * r_i) * inv_n
    r_pr = prior_factor.residual_only(state, problem.prior)
    cost = cost + 0.5 * jnp.sum(r_pr * r_pr) * inv_n
    if problem.line_obs is not None and line_orth is not None:
        from dynamic_vins_tpu.factors import line_factor

        r_l = line_factor.residual_only(
            state, line_orth, problem.line_obs,
            sqrt_info=line_factor.LINE_SQRT_INFO * config.line_weight)
        lvalid = problem.line_obs.valid & problem.line_valid[
            problem.line_obs.line]
        lr2 = jnp.sum(r_l * r_l, axis=-1)
        cost = cost + 0.5 * jnp.sum(
            jnp.where(lvalid, _huber_cost(lr2, config.huber_delta), 0.0))
    if axis is not None:
        cost = jax.lax.psum(cost, axis)
    return cost


def solve_damped(eq: NormalEquations, lm_valid, fixed_cols, lam, ridge,
                 line_valid=None):
    """One damped Schur solve.

    Returns (delta_c [Dc], delta_l [L], delta_g [Lc,4]|None)."""
    dtype = eq.H_cc.dtype
    D = eq.H_cc.shape[0]

    diag_cc = jnp.diag(eq.H_cc)
    # fixed/unconstrained dims get unit diagonal so the solve is defined
    damped_diag = diag_cc * (1.0 + lam) + ridge
    damped_diag = jnp.where(fixed_cols | (diag_cc <= 0.0),
                            jnp.maximum(damped_diag, 1.0), damped_diag)
    H_cc = eq.H_cc + jnp.diag(damped_diag - diag_cc)

    H_ll = eq.H_ll * (1.0 + lam)
    H_ll = jnp.where(lm_valid & (eq.H_ll > 0.0), H_ll, 1.0)
    b_l = jnp.where(lm_valid, eq.b_l, 0.0)
    H_lc = jnp.where(lm_valid[:, None], eq.H_lc, 0.0)

    inv_Hll = 1.0 / H_ll
    S = H_cc - H_lc.T @ (H_lc * inv_Hll[:, None])
    rhs = eq.b_c - H_lc.T @ (b_l * inv_Hll)

    # line blocks: damped 4x4 block-diagonal Schur elimination
    inv_Hgg = None
    H_gc = b_g = None
    if eq.H_gg is not None:
        Lc = eq.H_gg.shape[0]
        lv = line_valid if line_valid is not None else \
            jnp.ones((Lc,), bool)
        eye4 = jnp.eye(4, dtype=dtype)
        dg = jnp.diagonal(eq.H_gg, axis1=-2, axis2=-1)
        Hgg = eq.H_gg + (lam * dg + ridge + 1e-6)[..., None] * eye4
        Hgg = jnp.where(lv[:, None, None], Hgg, eye4)
        H_gc = jnp.where(lv[:, None, None], eq.H_gc, 0.0)
        b_g = jnp.where(lv[:, None], eq.b_g, 0.0)
        inv_Hgg = jnp.linalg.inv(Hgg)
        # S -= H_gc^T Hgg^-1 H_gc summed over line blocks
        tmp = jnp.einsum("gij,gjD->giD", inv_Hgg, H_gc)
        S = S - jnp.einsum("giD,giE->DE", H_gc, tmp)
        rhs = rhs - jnp.einsum("giD,gi->D", H_gc,
                               jnp.einsum("gij,gj->gi", inv_Hgg, b_g))

    # Jacobi preconditioning: normalizes the wide dynamic range between
    # IMU-bias and visual information so the Cholesky stays stable in f32
    scale = 1.0 / jnp.sqrt(jnp.maximum(jnp.diag(S), 1e-12))
    S_s = S * scale[:, None] * scale[None, :]
    cho, low = jax.scipy.linalg.cho_factor(S_s, lower=True)
    b_s = scale * rhs
    x = jax.scipy.linalg.cho_solve((cho, low), b_s)
    # one step of iterative refinement: recovers mantissa bits the f32
    # Cholesky loses on the wide-dynamic-range whitened system (one
    # extra [D,D] matvec + triangular solve — negligible vs JᵀJ)
    x = x + jax.scipy.linalg.cho_solve((cho, low), b_s - S_s @ x)
    delta_c = -scale * x
    delta_c = jnp.where(fixed_cols, 0.0, delta_c)
    delta_l = -(b_l + H_lc @ delta_c) * inv_Hll
    delta_l = jnp.where(lm_valid, delta_l, 0.0)

    delta_g = None
    if inv_Hgg is not None:
        resid_g = b_g + jnp.einsum("giD,D->gi", H_gc, delta_c)
        delta_g = -jnp.einsum("gij,gj->gi", inv_Hgg, resid_g)
    return delta_c, delta_l, delta_g


class SolveInfo(NamedTuple):
    initial_cost: jnp.ndarray
    final_cost: jnp.ndarray
    final_lambda: jnp.ndarray
    accepted: jnp.ndarray     # [iters] bool


def solve(state: layout.WindowState, inv_depth, problem: BAProblem,
          config: SolverConfig = SolverConfig(), line_orth=None,
          axis=None, n_shards: int = 1):
    """Run LM for config.max_iters.

    Returns (state, inv_depth, info) — or, when the problem carries
    lines and `line_orth` is given, (state, inv_depth, line_orth, info).

    axis/n_shards: inside a `shard_map` with obs/line rows sharded over
    `axis`, the whole LM loop runs as ONE multi-device computation —
    normal equations psum-reduced each iteration, the small damped
    Schur solve replicated (see build_normal_equations).
    """
    from dynamic_vins_tpu.geometry import lines as line_geom

    dtype = state.p.dtype
    has_lines = problem.line_obs is not None and line_orth is not None
    if not has_lines:
        line_orth0 = jnp.zeros((0, 4), dtype)
    else:
        line_orth0 = line_orth

    # Evaluate J and cost together: build_normal_equations already
    # computes the robustified cost from the same residuals, so carrying
    # the normal equations through the scan removes the separate
    # residual-only pass per iteration (~25% of an LM iteration on TPU;
    # on reject the previously built equations at the still-current
    # point are reused with a larger lambda — the accept logic is
    # unchanged).
    eq0 = build_normal_equations(state, inv_depth, problem, config,
                                 line_orth0 if has_lines else None,
                                 axis=axis, n_shards=n_shards)
    init_cost = eq0.cost

    def step(carry, _):
        st, dep, orth, lam, cost, eq = carry
        dc, dl, dg = solve_damped(eq, problem.lm_valid,
                                  problem.fixed_cols, lam, config.ridge,
                                  problem.line_valid)
        new_st = st.boxplus(dc)
        new_dep = dep + dl
        new_orth = (line_geom.orth_boxplus(orth, dg) if has_lines
                    else orth)
        new_eq = build_normal_equations(new_st, new_dep, problem, config,
                                        new_orth if has_lines else None,
                                        axis=axis, n_shards=n_shards)
        new_cost = new_eq.cost
        accept = (new_cost < cost) & jnp.isfinite(new_cost)
        lam_next = jnp.where(accept, lam * config.lambda_down,
                             lam * config.lambda_up)
        lam_next = jnp.clip(lam_next, config.min_lambda, config.max_lambda)
        sel = lambda a, b: jax.tree.map(
            lambda x, y: jnp.where(accept, x, y), a, b)
        st_out = sel(new_st, st)
        dep_out = jnp.where(accept, new_dep, dep)
        orth_out = jnp.where(accept, new_orth, orth)
        cost_out = jnp.where(accept, new_cost, cost)
        eq_out = sel(new_eq, eq)
        return (st_out, dep_out, orth_out, lam_next, cost_out,
                eq_out), accept

    lam0 = jnp.asarray(config.init_lambda, dtype)
    (st, dep, orth, lam, cost, _), accepted = jax.lax.scan(
        step, (state, inv_depth, line_orth0, lam0, init_cost, eq0), None,
        length=config.max_iters)
    info = SolveInfo(init_cost, cost, lam, accepted)
    if has_lines:
        return st, dep, orth, info
    return st, dep, info
