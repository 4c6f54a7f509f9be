"""Line reprojection factor (orthonormal 4-dof parameterization).

Capability parity with `lineProjectionFactor`
(`estimator/factor/line_projection_factor.{h,cpp}`, 598 LoC of hand
Jacobians): residual = distances of the two observed normalized
endpoints to the projected infinite line, Jacobians via jacrev over the
16-dim local tangent [dpose 6, dex 6, dorth 4].

Lines live in the WORLD frame (not anchored), matching the reference's
LineLandmark; columns for the orth parameters are appended after the
camera block (see solver/gauss_newton.py line support).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from dynamic_vins_tpu.geometry import lie, lines
from dynamic_vins_tpu.solver import layout
from dynamic_vins_tpu.utils import precision

LINE_SQRT_INFO = 460.0 / 1.5


class LineObs(NamedTuple):
    """Fixed-capacity line observation table."""

    frame_j: jnp.ndarray   # [N] observing frame
    cam_j: jnp.ndarray     # [N] 0 left / 1 right
    line: jnp.ndarray      # [N] line slot
    s: jnp.ndarray         # [N,3] observed start point (normalized, z=1)
    e: jnp.ndarray         # [N,3] observed end point
    valid: jnp.ndarray     # [N]

    @classmethod
    def empty(cls, n: int, dtype=None):
        dtype = dtype or precision.default_float()
        zi = jnp.zeros((n,), jnp.int32)
        z3 = jnp.zeros((n, 3), dtype).at[:, 2].set(1.0)
        return cls(zi, zi, zi, z3, z3, jnp.zeros((n,), bool))


def _residual_local(delta, row, state: layout.WindowState, orth_row,
                    sqrt_info):
    """delta: [16] = [dpose_j 6, dex 6, dorth 4]."""
    fj, cj = row.frame_j, row.cam_j
    p_j, q_j = lie.pose_boxplus(state.p[fj], state.q[fj], delta[0:6])
    p_bc, q_bc = lie.pose_boxplus(state.p_bc[cj], state.q_bc[cj],
                                  delta[6:12])
    orth = lines.orth_boxplus(orth_row, delta[12:16])
    n_w, d_w = lines.orth_to_plucker(orth)

    # world -> body -> camera
    p_bw, q_bw = lie.pose_inverse(p_j, q_j)
    n_b, d_b = lines.transform_line(n_w, d_w, p_bw, q_bw)
    p_cb, q_cb = lie.pose_inverse(p_bc, q_bc)
    n_c, _ = lines.transform_line(n_b, d_b, p_cb, q_cb)

    l = lines.project_line(n_c)
    r1 = lines.line_point_distance(l, row.s)
    r2 = lines.line_point_distance(l, row.e)
    return sqrt_info * jnp.stack([r1, r2])


def evaluate(state: layout.WindowState, line_orth, obs: LineObs,
             sqrt_info: float = LINE_SQRT_INFO):
    """Residuals [N,2], Jacobians [N,2,16], camera cols [N,12].

    The 4 orth columns are implicit: block `obs.line` of the line-block
    column space (handled by the solver's line assembly)."""
    dtype = state.p.dtype
    F = state.num_frames

    def one(row, orth_row):
        zero = jnp.zeros((16,), dtype)
        r = _residual_local(zero, row, state, orth_row, sqrt_info)
        J = jax.jacrev(_residual_local)(zero, row, state, orth_row,
                                        sqrt_info)
        return r, J

    r, J = jax.vmap(one)(obs, line_orth[obs.line])
    r = jnp.where(obs.valid[:, None], r, 0.0)
    J = jnp.where(obs.valid[:, None, None], J, 0.0)

    base = jnp.arange(6, dtype=jnp.int32)
    cols = jnp.concatenate([
        layout.pose_col(obs.frame_j)[:, None] + base[None, :],
        layout.extrinsic_col(obs.cam_j, F)[:, None] + base[None, :],
    ], axis=1)
    return r, J[:, :, :12], J[:, :, 12:16], cols


def residual_only(state: layout.WindowState, line_orth, obs: LineObs,
                  sqrt_info: float = LINE_SQRT_INFO):
    dtype = state.p.dtype

    def one(row, orth_row):
        return _residual_local(jnp.zeros((16,), dtype), row, state,
                               orth_row, sqrt_info)

    r = jax.vmap(one)(obs, line_orth[obs.line])
    return jnp.where(obs.valid[:, None], r, 0.0)


def _residual_orth(dorth, row, state, orth_row, sqrt_info):
    """Residual as a function of the 4-dof orth update only (poses fixed)."""
    delta = jnp.concatenate([jnp.zeros((12,), dorth.dtype), dorth])
    return _residual_local(delta, row, state, orth_row, sqrt_info)


def refine_orth(state: layout.WindowState, line_orth, obs: LineObs,
                line_valid, iters: int = 5, huber_delta: float = 1.0,
                damping: float = 1e-4, sqrt_info: float = LINE_SQRT_INFO,
                axis=None):
    """Line-only optimization with the window poses held fixed.

    Capability parity with the reference's `OptimizationWithOnlyLine`
    (`estimator/estimator.cpp:345-400`): freshly triangulated lines get
    their orthonormal parameters refined against all their observations
    before entering the joint BA, so the joint solve starts from a good
    linearization point. With poses fixed every line is independent, so
    this is a vmapped damped Gauss-Newton over [Lc, 4, 4] blocks — one
    batched 4x4 solve per iteration, fully parallel on the TPU (the
    reference runs a whole separate Ceres problem for this).

    Returns the refined [Lc, 4] orth array; invalid slots pass through.

    axis: inside a shard_map with the obs rows sharded along `axis`,
    per-line blocks are psum-reduced so every shard refines against ALL
    observations (distributed engine mode).
    """
    from dynamic_vins_tpu.solver.gauss_newton import (_huber_cost,
                                                      _huber_weight)

    Lc = line_orth.shape[0]
    dtype = line_orth.dtype
    valid = obs.valid & line_valid[obs.line]
    wv = valid.astype(dtype)
    eye4 = jnp.eye(4, dtype=dtype)
    ps = (lambda x: x) if axis is None else \
        (lambda x: jax.lax.psum(x, axis))

    def per_line_cost(orth):
        r = jax.vmap(lambda row, o: _residual_orth(
            jnp.zeros((4,), dtype), row, state, o, sqrt_info))(
                obs, orth[obs.line])
        r2 = jnp.sum(r * r, axis=-1)
        c = _huber_cost(r2, huber_delta) * wv
        return ps(jax.ops.segment_sum(c, obs.line, num_segments=Lc))

    def step(carry, _):
        orth, cost = carry

        def one(row, orth_row):
            z = jnp.zeros((4,), dtype)
            r = _residual_orth(z, row, state, orth_row, sqrt_info)
            J = jax.jacrev(_residual_orth)(z, row, state, orth_row,
                                           sqrt_info)
            return r, J

        r, J = jax.vmap(one)(obs, orth[obs.line])
        r = jnp.where(valid[:, None], r, 0.0)
        J = jnp.where(valid[:, None, None], J, 0.0)
        w = _huber_weight(jnp.sum(r * r, axis=-1), huber_delta)
        r = r * w[:, None]
        J = J * w[:, None, None]

        H = ps(jax.ops.segment_sum(
            jnp.einsum("nri,nrj->nij", J, J), obs.line,
            num_segments=Lc))
        g = ps(jax.ops.segment_sum(
            jnp.einsum("nri,nr->ni", J, r), obs.line, num_segments=Lc))
        dg = jnp.diagonal(H, axis1=-2, axis2=-1)
        H = H + (damping * dg + 1e-8)[..., None] * eye4
        # lines with no observations get identity blocks (delta = 0)
        has_obs = ps(jax.ops.segment_sum(wv, obs.line,
                                         num_segments=Lc)) > 0
        ok = has_obs & line_valid
        H = jnp.where(ok[:, None, None], H, eye4)
        g = jnp.where(ok[:, None], g, 0.0)
        delta = -jnp.linalg.solve(H, g[..., None])[..., 0]
        cand = lines.orth_boxplus(orth, delta)
        new_cost = per_line_cost(cand)
        better = ok & (new_cost < cost) & jnp.isfinite(new_cost)
        out = jnp.where(better[:, None], cand, orth)
        return (out, jnp.where(better, new_cost, cost)), better

    cost0 = per_line_cost(line_orth)
    (orth, _), _ = jax.lax.scan(step, (line_orth, cost0), None,
                                length=iters)
    return orth
