"""IMU preintegration factor rows for the window solver.

Capability parity with `IMUFactor` (`estimator/imu/imu_factor.h:25`,
SizedCostFunction<15, 7,9,7,9>): a whitened 15-dim residual between
consecutive window frames, Jacobians via jacrev over the 30-dim local
tangent [dpose_i 6, dspeedbias_i 9, dpose_j 6, dspeedbias_j 9].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from dynamic_vins_tpu.geometry import lie
from dynamic_vins_tpu.imu import preintegration as pre
from dynamic_vins_tpu.solver import layout


def _residual_local(delta, state: layout.WindowState, k,
                    pre_k: pre.Preintegration, sqrt_info_k, gravity):
    """Whitened residual between frames k and k+1 at a tangent delta."""
    p_i, q_i = lie.pose_boxplus(state.p[k], state.q[k], delta[0:6])
    v_i = state.v[k] + delta[6:9]
    ba_i = state.ba[k] + delta[9:12]
    bg_i = state.bg[k] + delta[12:15]
    p_j, q_j = lie.pose_boxplus(state.p[k + 1], state.q[k + 1],
                                delta[15:21])
    v_j = state.v[k + 1] + delta[21:24]
    ba_j = state.ba[k + 1] + delta[24:27]
    bg_j = state.bg[k + 1] + delta[27:30]
    r = pre.evaluate(pre_k, p_i, q_i, v_i, ba_i, bg_i,
                     p_j, q_j, v_j, ba_j, bg_j, gravity)
    return sqrt_info_k @ r


def evaluate(state: layout.WindowState, pres: pre.Preintegration,
             valid, gravity=pre.GRAVITY):
    """Residuals [E,15], Jacobians [E,15,30], columns [E,30].

    pres: batched Preintegration with leading dim E = num_frames-1
    (edge k connects frames k and k+1). valid: [E] bool.
    """
    dtype = state.p.dtype
    F = state.num_frames
    E = F - 1
    ks = jnp.arange(E, dtype=jnp.int32)
    sqrt_infos = pres.sqrt_info()

    def one(k, pre_k, si):
        zero = jnp.zeros((30,), dtype)
        r = _residual_local(zero, state, k, pre_k, si, gravity)
        J = jax.jacrev(_residual_local)(zero, state, k, pre_k, si, gravity)
        return r, J

    r, J = jax.vmap(one)(ks, pres, sqrt_infos)
    r = jnp.where(valid[:, None], r, 0.0)
    J = jnp.where(valid[:, None, None], J, 0.0)

    base6 = jnp.arange(6, dtype=jnp.int32)
    base9 = jnp.arange(9, dtype=jnp.int32)
    cols = jnp.concatenate([
        layout.pose_col(ks)[:, None] + base6[None, :],
        layout.speedbias_col(ks, F)[:, None] + base9[None, :],
        layout.pose_col(ks + 1)[:, None] + base6[None, :],
        layout.speedbias_col(ks + 1, F)[:, None] + base9[None, :],
    ], axis=1)
    return r, J, cols


def residual_only(state: layout.WindowState, pres: pre.Preintegration,
                  valid, gravity=pre.GRAVITY):
    dtype = state.p.dtype
    E = state.num_frames - 1
    ks = jnp.arange(E, dtype=jnp.int32)
    sqrt_infos = pres.sqrt_info()

    def one(k, pre_k, si):
        return _residual_local(jnp.zeros((30,), dtype), state, k, pre_k,
                               si, gravity)

    r = jax.vmap(one)(ks, pres, sqrt_infos)
    return jnp.where(valid[:, None], r, 0.0)
