"""Per-object bundle adjustment, vmapped across all tracked objects.

Capability parity with `InstanceManager::Optimization`
(`estimator/estimator_insts.cpp:772` — one Ceres DENSE_SCHUR problem per
object per frame, loosely coupled: camera states fixed). TPU-first
redesign: every object's window problem is the same static shape, so ALL
objects solve simultaneously under one `vmap`ped LM loop — the per-chip
batch replaces the reference's sequential per-object solves.

Object tangent: [dpose 6 x F, dv 3, dw 3, ddims 3, dlm 3 x Lo].
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from dynamic_vins_tpu.factors import object_factors as of
from dynamic_vins_tpu.geometry import lie


class ObjectProblem(NamedTuple):
    """Factor data for ONE object (vmap adds the leading object axis)."""

    # observations of object landmarks (normalized; stereo like the
    # reference's TrackRightByPad object features)
    obs_frame: jnp.ndarray    # [No] int32
    obs_cam: jnp.ndarray      # [No] int32 (0 left, 1 right)
    obs_lm: jnp.ndarray       # [No] int32
    obs_norm: jnp.ndarray     # [No,2]
    obs_valid: jnp.ndarray    # [No]
    # per-frame "extra point" clouds (world frame) for the enclose hinge
    extra_pts: jnp.ndarray    # [F,Ne,3]
    extra_valid: jnp.ndarray  # [F,Ne]
    # detections
    dims_det: jnp.ndarray     # [3]
    dims_det_valid: jnp.ndarray   # []
    q_det: jnp.ndarray        # [F,4] detected orientation per frame
    det_valid: jnp.ndarray    # [F]
    # bookkeeping
    frame_valid: jnp.ndarray  # [F] object tracked in frame
    lm_valid: jnp.ndarray     # [Lo]
    lm_prior: jnp.ndarray     # [Lo,3] triangulated object-frame points
                              # (regularizes the landmark/c_off gauge)
    times: jnp.ndarray        # [F]
    # ego camera poses (world->camera) per frame and camera, FIXED
    # during the object opt (loosely coupled)
    p_cw: jnp.ndarray         # [F,2,3]
    q_cw: jnp.ndarray         # [F,2,4]


class ObjectSolverConfig(NamedTuple):
    max_iters: int = 6
    init_lambda: float = 1e-3
    lambda_up: float = 4.0
    lambda_down: float = 0.5
    huber_delta: float = 2.0
    use_motion_model: bool = True
    use_reprojection: bool = True
    dims_weight: float = 5.0
    orient_weight: float = 1.0
    centroid_weight: float = 50.0
    extra_centroid_weight: float = 20.0
    landmark_prior_weight: float = 5.0
    ridge: float = 1e-6


def _tangent_dim(F: int, Lo: int):
    return 6 * F + 12 + 3 * Lo


def _apply_delta(state: of.ObjectWindow, pts_obj, delta, F, Lo):
    dpose = delta[: 6 * F].reshape(F, 6)
    p, q = lie.pose_boxplus(state.p, state.q, dpose)
    v = state.v + delta[6 * F: 6 * F + 3]
    w = state.w + delta[6 * F + 3: 6 * F + 6]
    dims = state.dims + delta[6 * F + 6: 6 * F + 9]
    c_off = state.c_off + delta[6 * F + 9: 6 * F + 12]
    lm = pts_obj + delta[6 * F + 12:].reshape(Lo, 3)
    return of.ObjectWindow(p, q, v, w, dims, c_off), lm


def _residuals(state: of.ObjectWindow, pts_obj, prob: ObjectProblem,
               cfg: ObjectSolverConfig):
    F = state.p.shape[0]
    parts = []

    if cfg.use_reprojection:
        p_wo_j = state.p[prob.obs_frame]
        q_wo_j = state.q[prob.obs_frame]
        p_cw_j = prob.p_cw[prob.obs_frame, prob.obs_cam]
        q_cw_j = prob.q_cw[prob.obs_frame, prob.obs_cam]
        lm = pts_obj[prob.obs_lm]
        valid = (prob.obs_valid & prob.lm_valid[prob.obs_lm]
                 & prob.frame_valid[prob.obs_frame])
        pts_w = lie.quat_rotate(q_wo_j, lm) + p_wo_j
        pts_c = lie.quat_rotate(q_cw_j, pts_w) + p_cw_j
        z = jnp.maximum(pts_c[:, 2:3], 1e-3)
        r = (460.0 / 1.5) * (pts_c[:, :2] / z - prob.obs_norm)
        r = jnp.where(valid[:, None], r, 0.0)
        # Huber
        rn2 = jnp.sum(r * r, -1, keepdims=True)
        hw = jnp.where(rn2 <= cfg.huber_delta ** 2, 1.0,
                       jnp.sqrt(cfg.huber_delta
                                / jnp.sqrt(jnp.maximum(rn2, 1e-12))))
        parts.append((r * hw).reshape(-1))

    # enclose hinge per frame
    def enclose_frame(k):
        return of.box_enclose_residual(
            state.p[k], state.q[k], state.dims, prob.extra_pts[k],
            prob.extra_valid[k] & prob.frame_valid[k]).reshape(-1)

    parts.append(jnp.concatenate([enclose_frame(k) for k in range(F)]))

    # dims prior
    r_dims = of.box_dims_residual(state.dims, prob.dims_det,
                                  cfg.dims_weight)
    parts.append(jnp.where(prob.dims_det_valid, r_dims, 0.0))

    # orientation vs detection
    r_orient = jax.vmap(
        lambda qk, qd: of.box_orientation_residual(
            qk, qd, cfg.orient_weight))(state.q, prob.q_det)
    r_orient = jnp.where((prob.det_valid & prob.frame_valid)[:, None],
                         r_orient, 0.0)
    parts.append(r_orient.reshape(-1))

    if cfg.use_motion_model:
        parts.append(of.const_twist_residual(
            state.p, state.q, state.v, state.w, prob.times,
            prob.frame_valid).reshape(-1))

    # stereo-cloud anchor: the world centroid of each frame's extra
    # points is a body-fixed point (c_off) on the object — this breaks
    # the mono depth x landmark-scale near-gauge using the world-
    # anchored stereo clouds (the reference leans on box-fit of the
    # same clouds, estimator_insts.cpp PropagatePose/BoxFitPoints)
    ne = jnp.maximum(jnp.sum(prob.extra_valid, axis=1), 1)[:, None]
    cent_w = jnp.sum(jnp.where(prob.extra_valid[..., None],
                               prob.extra_pts, 0.0), axis=1) / ne
    cent_pred = jax.vmap(
        lambda pk, qk: lie.quat_rotate(qk, state.c_off) + pk
    )(state.p, state.q)
    has_extra = (jnp.sum(prob.extra_valid, axis=1) > 3) \
        & prob.frame_valid
    r_cent = cfg.extra_centroid_weight * (cent_w - cent_pred)
    parts.append(jnp.where(has_extra[:, None], r_cent, 0.0).reshape(-1))

    # landmark prior: object-frame points stay near their triangulated
    # init (σ ≈ 20 cm) — without it the hinge on noisy clouds can drag
    # the box along the landmark/c_off counter-shift direction
    r_lm = cfg.landmark_prior_weight * (pts_obj - prob.lm_prior)
    parts.append(jnp.where(prob.lm_valid[:, None], r_lm, 0.0).reshape(-1))

    # gauge anchoring: object-frame origin at the landmark centroid
    # (otherwise the frame can slide against the landmarks — the hinge
    # is one-sided and fixes translation only up to box slack)
    nlm = jnp.maximum(jnp.sum(prob.lm_valid), 1)
    centroid = jnp.sum(jnp.where(prob.lm_valid[:, None], pts_obj, 0.0),
                       axis=0) / nlm
    parts.append(cfg.centroid_weight * centroid)

    return jnp.concatenate(parts)


def solve_one(state: of.ObjectWindow, pts_obj, prob: ObjectProblem,
              cfg: ObjectSolverConfig, active):
    """LM for one object. `active`: [] bool — inactive objects no-op."""
    F = state.p.shape[0]
    Lo = pts_obj.shape[0]
    D = _tangent_dim(F, Lo)
    dtype = state.p.dtype

    def cost_of(st, lm):
        r = _residuals(st, lm, prob, cfg)
        return 0.5 * jnp.sum(r * r)

    def step(carry, _):
        st, lm, lam, cost = carry

        def res_local(delta):
            st2, lm2 = _apply_delta(st, lm, delta, F, Lo)
            return _residuals(st2, lm2, prob, cfg)

        zero = jnp.zeros((D,), dtype)
        r = res_local(zero)
        J = jax.jacfwd(res_local)(zero)
        H = J.T @ J
        g = J.T @ r
        diag = jnp.diag(H)
        damped = diag * (1.0 + lam) + cfg.ridge
        damped = jnp.where(diag <= 0.0, 1.0, damped)
        H = H + jnp.diag(damped - diag)
        scale = 1.0 / jnp.sqrt(jnp.maximum(jnp.diag(H), 1e-12))
        Hs = H * scale[:, None] * scale[None, :]
        cho, low = jax.scipy.linalg.cho_factor(Hs, lower=True)
        delta = -scale * jax.scipy.linalg.cho_solve((cho, low),
                                                    scale * g)
        st2, lm2 = _apply_delta(st, lm, delta, F, Lo)
        new_cost = cost_of(st2, lm2)
        accept = (new_cost < cost) & jnp.isfinite(new_cost) & active
        lam_next = jnp.clip(
            jnp.where(accept, lam * cfg.lambda_down, lam * cfg.lambda_up),
            1e-10, 1e8)
        sel = lambda a, b: jax.tree.map(
            lambda x, y: jnp.where(accept, x, y), a, b)
        return (sel(st2, st), jnp.where(accept, lm2, lm), lam_next,
                jnp.where(accept, new_cost, cost)), accept

    lam0 = jnp.asarray(cfg.init_lambda, dtype)
    init_cost = cost_of(state, pts_obj)
    (st, lm, lam, cost), acc = jax.lax.scan(
        step, (state, pts_obj, lam0, init_cost), None,
        length=cfg.max_iters)
    return st, lm, cost


def solve_all(states: of.ObjectWindow, pts_obj, probs: ObjectProblem,
              cfg: ObjectSolverConfig, active):
    """vmap over the leading object axis of every argument."""
    return jax.vmap(
        lambda s, l, p, a: solve_one(s, l, p, cfg, a)
    )(states, pts_obj, probs, active)
