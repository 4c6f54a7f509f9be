"""Reprojection factors, unified over the reference's three variants.

Capability parity with `ProjectionTwoFrameOneCamFactor` /
`ProjectionTwoFrameTwoCamFactor` / `ProjectionOneFrameTwoCamFactor`
(`dynamic_vins/src/estimator/factor/projection_*.{h,cpp}`): a landmark is
anchored by inverse depth at its first observation (frame i, left cam)
and reprojected into any observing (frame j, cam c) with td
compensation. Setting frame_j == frame_i and cam_j == 1 reproduces the
one-frame-two-cam (stereo) factor.

TPU-first: one residual function, `vmap`ped over an observation table;
Jacobians w.r.t. the 26-dim local tangent via `jax.jacrev` (analytic-
quality, derived by AD instead of 850 lines of hand-written chain rule).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from dynamic_vins_tpu.geometry import lie
from dynamic_vins_tpu.solver import layout
from dynamic_vins_tpu.utils import precision

# sqrt information of the pixel noise, normalized-plane units:
# FOCAL_LENGTH / 1.5 (estimator.cpp:685 — sqrt_info = F/1.5 * I2)
FOCAL_LENGTH = 460.0
DEFAULT_SQRT_INFO = FOCAL_LENGTH / 1.5


class ProjObs(NamedTuple):
    """Flat observation table; fixed capacity with a validity mask.

    pt_i/pt_j are undistorted normalized-plane coords with z=1;
    vel_i/vel_j are normalized-plane velocities (z component 0) used for
    time-offset compensation.
    """

    frame_i: jnp.ndarray   # [N] int32 anchor frame
    frame_j: jnp.ndarray   # [N] int32 observing frame
    cam_j: jnp.ndarray     # [N] int32 observing camera (0 left, 1 right)
    lm: jnp.ndarray        # [N] int32 landmark slot index
    pt_i: jnp.ndarray      # [N,3]
    pt_j: jnp.ndarray      # [N,3]
    vel_i: jnp.ndarray     # [N,3]
    vel_j: jnp.ndarray     # [N,3]
    td_ref: jnp.ndarray    # [N] time offset at capture
    valid: jnp.ndarray     # [N] bool

    @classmethod
    def empty(cls, n: int, dtype=None):
        dtype = dtype or precision.default_float()
        zi = jnp.zeros((n,), jnp.int32)
        z3 = jnp.zeros((n, 3), dtype)
        z3 = z3.at[:, 2].set(1.0)
        v3 = jnp.zeros((n, 3), dtype)
        return cls(zi, zi, zi, zi, z3, z3, v3, v3,
                   jnp.zeros((n,), dtype), jnp.zeros((n,), bool))


def _residual_local(delta, row, state: layout.WindowState, inv_depth_row,
                    sqrt_info):
    """Residual at a local tangent perturbation (for jacfwd at zero).

    delta: [26] = [dpose_i 6, dpose_j 6, dex_i 6, dex_j 6, dtd 1, ddep 1].
    """
    fi, fj, cj = row.frame_i, row.frame_j, row.cam_j
    p_i, q_i = lie.pose_boxplus(state.p[fi], state.q[fi], delta[0:6])
    p_j, q_j = lie.pose_boxplus(state.p[fj], state.q[fj], delta[6:12])
    p_bci, q_bci = lie.pose_boxplus(state.p_bc[0], state.q_bc[0],
                                    delta[12:18])
    p_bcj, q_bcj = lie.pose_boxplus(state.p_bc[cj], state.q_bc[cj],
                                    delta[18:24])
    td = state.td + delta[24]
    inv_dep = inv_depth_row + delta[25]

    pts_i_td = row.pt_i - (td - row.td_ref) * row.vel_i
    pts_j_td = row.pt_j - (td - row.td_ref) * row.vel_j

    pts_cam_i = pts_i_td / jnp.maximum(inv_dep, 1e-4)
    pts_b_i = lie.quat_rotate(q_bci, pts_cam_i) + p_bci
    pts_w = lie.quat_rotate(q_i, pts_b_i) + p_i
    pts_b_j = lie.quat_rotate(lie.quat_conjugate(q_j), pts_w - p_j)
    pts_cam_j = lie.quat_rotate(lie.quat_conjugate(q_bcj),
                                pts_b_j - p_bcj)
    z = pts_cam_j[2]
    z_safe = jnp.where(jnp.abs(z) < 1e-6, 1e-6, z)
    r = pts_cam_j[:2] / z_safe - pts_j_td[:2]
    return sqrt_info * r


def evaluate(state: layout.WindowState, inv_depth, obs: ProjObs,
             sqrt_info: float = DEFAULT_SQRT_INFO):
    """Residuals [N,2], camera Jacobians [N,2,25], depth Jacobians [N,2],
    camera column indices [N,25]. Invalid rows are zeroed."""
    dtype = state.p.dtype
    F = state.num_frames

    def one(row, dep):
        zero = jnp.zeros((26,), dtype)
        r = _residual_local(zero, row, state, dep, sqrt_info)
        J = jax.jacrev(_residual_local)(zero, row, state, dep, sqrt_info)
        return r, J

    r, J = jax.vmap(one)(obs, inv_depth[obs.lm])

    valid = obs.valid[:, None]
    r = jnp.where(valid, r, 0.0)
    J = jnp.where(valid[..., None], J, 0.0)

    j_cam = J[:, :, 0:25]
    j_dep = J[:, :, 25]

    base = jnp.arange(6, dtype=jnp.int32)
    cols = jnp.concatenate([
        layout.pose_col(obs.frame_i)[:, None] + base[None, :],
        layout.pose_col(obs.frame_j)[:, None] + base[None, :],
        layout.extrinsic_col(jnp.zeros_like(obs.cam_j), F)[:, None]
        + base[None, :],
        layout.extrinsic_col(obs.cam_j, F)[:, None] + base[None, :],
        jnp.full((obs.frame_i.shape[0], 1), layout.td_col(F),
                 dtype=jnp.int32),
    ], axis=1)
    return r, j_cam, j_dep, cols


def residual_only(state: layout.WindowState, inv_depth, obs: ProjObs,
                  sqrt_info: float = DEFAULT_SQRT_INFO):
    dtype = state.p.dtype

    def one(row, dep):
        return _residual_local(jnp.zeros((26,), dtype), row, state, dep,
                               sqrt_info)

    r = jax.vmap(one)(obs, inv_depth[obs.lm])
    return jnp.where(obs.valid[:, None], r, 0.0)


def unpack_obs(obs_i, obs_f, valid):
    """Rebuild a ProjObs from the packed transfer arrays.

    obs_i: [C,4] int32 (frame_i, frame_j, cam_j, lm);
    obs_f: [C,9] (pt_i xy, pt_j xy, vel_i xy, vel_j xy, td_ref)."""
    C = obs_i.shape[0]
    one = jnp.ones((C, 1), obs_f.dtype)
    zero = jnp.zeros((C, 1), obs_f.dtype)
    return ProjObs(
        frame_i=obs_i[:, 0], frame_j=obs_i[:, 1], cam_j=obs_i[:, 2],
        lm=obs_i[:, 3],
        pt_i=jnp.concatenate([obs_f[:, 0:2], one], axis=1),
        pt_j=jnp.concatenate([obs_f[:, 2:4], one], axis=1),
        vel_i=jnp.concatenate([obs_f[:, 4:6], zero], axis=1),
        vel_j=jnp.concatenate([obs_f[:, 6:8], zero], axis=1),
        td_ref=obs_f[:, 8], valid=valid)
