"""IMU preintegration on the delta manifold, as a `lax.scan`.

Capability parity with the reference's `IntegrationBase`
(`dynamic_vins/src/estimator/imu/integration_base.h:21-205`): midpoint
integration of (delta_p, delta_q, delta_v) with 15x15 Jacobian and
covariance propagation, bias-corrected residual `evaluate`, and
repropagation (here: simply re-running `preintegrate` on the buffered
measurements with new biases — the measurement buffer lives host-side).

State/error ordering (VINS convention): [P(0:3), theta(3:6), V(6:9),
Ba(9:12), Bg(12:15)]; noise ordering [na0, ng0, na1, ng1, nba, nbg] (18).

TPU-first design: NO sequential scan. The midpoint recursion factors
into (1) a quaternion prefix-product (associative), (2) elementwise
cumsums for delta_v/delta_p once all rotations are known, and (3) an
affine matrix recursion X_{k+1} = F_k X_k F_kᵀ + G_k for the
covariance (and X_{k+1} = F_k X_k for the Jacobian), which is
associative over pairs (A, C) ∘ (A', C') = (A'A, A'CA'ᵀ + C').
Everything becomes `lax.associative_scan` — log2(N) levels of batched
15x15 matmuls on the MXU instead of N sequential tiny steps. Measured
on TPU v5e: 24.4 ms -> ~1 ms for the padded 256-step buffer. Batches
of intervals vmap over the leading axis.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from dynamic_vins_tpu.geometry import lie


class ImuNoise(NamedTuple):
    """IMU noise densities (reference defaults, kitti_tracking.yaml /
    euroc.yaml: acc_n 0.1, gyr_n 0.01, acc_w 1e-3, gyr_w 1e-4)."""

    acc_n: float = 0.1
    gyr_n: float = 0.01
    acc_w: float = 1.0e-3
    gyr_w: float = 1.0e-4


GRAVITY = jnp.array([0.0, 0.0, 9.81])


class Preintegration(NamedTuple):
    """Result of integrating one IMU interval at linearization biases."""

    delta_p: jnp.ndarray      # [...,3]
    delta_q: jnp.ndarray      # [...,4] wxyz
    delta_v: jnp.ndarray      # [...,3]
    jacobian: jnp.ndarray     # [...,15,15] d(delta)/d(state0, biases)
    covariance: jnp.ndarray   # [...,15,15]
    sum_dt: jnp.ndarray       # [...]
    linearized_ba: jnp.ndarray  # [...,3]
    linearized_bg: jnp.ndarray  # [...,3]

    @property
    def dp_dba(self):
        return self.jacobian[..., 0:3, 9:12]

    @property
    def dp_dbg(self):
        return self.jacobian[..., 0:3, 12:15]

    @property
    def dq_dbg(self):
        return self.jacobian[..., 3:6, 12:15]

    @property
    def dv_dba(self):
        return self.jacobian[..., 6:9, 9:12]

    @property
    def dv_dbg(self):
        return self.jacobian[..., 6:9, 12:15]

    def sqrt_info(self):
        """Matrix U with U^T U = covariance^-1 (whitening transform).

        Computed as L^-1 with L L^T = cov — numerically robust even for
        the tiny bias-random-walk variances on the cov diagonal.
        """
        cov = 0.5 * (self.covariance +
                     jnp.swapaxes(self.covariance, -1, -2))
        L = jnp.linalg.cholesky(cov)
        eye = jnp.broadcast_to(jnp.eye(15, dtype=cov.dtype), cov.shape)
        return jax.scipy.linalg.solve_triangular(L, eye, lower=True)


def _noise_matrix(noise: ImuNoise, dtype):
    diag = jnp.concatenate([
        jnp.full((3,), noise.acc_n ** 2, dtype=dtype),
        jnp.full((3,), noise.gyr_n ** 2, dtype=dtype),
        jnp.full((3,), noise.acc_n ** 2, dtype=dtype),
        jnp.full((3,), noise.gyr_n ** 2, dtype=dtype),
        jnp.full((3,), noise.acc_w ** 2, dtype=dtype),
        jnp.full((3,), noise.gyr_w ** 2, dtype=dtype),
    ])
    return jnp.diag(diag)


def midpoint_step(delta_p, delta_q, delta_v, ba, bg,
                  acc0, gyr0, acc1, gyr1, dt):
    """One midpoint integration step; returns new deltas + (F, V) matrices.

    Mirrors `IntegrationBase::midPointIntegration`
    (integration_base.h:70-143) but uses the exact SO(3) exponential for
    the quaternion update instead of the first-order deltaQ.
    """
    dtype = delta_p.dtype
    un_acc_0 = lie.quat_rotate(delta_q, acc0 - ba)
    un_gyr = 0.5 * (gyr0 + gyr1) - bg
    new_delta_q = lie.quat_normalize(
        lie.quat_multiply(delta_q, lie.so3_exp_quat(un_gyr * dt)))
    un_acc_1 = lie.quat_rotate(new_delta_q, acc1 - ba)
    un_acc = 0.5 * (un_acc_0 + un_acc_1)
    new_delta_p = delta_p + delta_v * dt + 0.5 * un_acc * dt * dt
    new_delta_v = delta_v + un_acc * dt

    w_x = lie.hat(un_gyr)
    a0_x = lie.hat(acc0 - ba)
    a1_x = lie.hat(acc1 - ba)
    R0 = lie.quat_to_matrix(delta_q)
    R1 = lie.quat_to_matrix(new_delta_q)
    I3 = jnp.eye(3, dtype=dtype)
    dt2 = dt * dt

    F = jnp.zeros((15, 15), dtype=dtype)
    F = F.at[0:3, 0:3].set(I3)
    F = F.at[0:3, 3:6].set(
        -0.25 * R0 @ a0_x * dt2
        + -0.25 * R1 @ a1_x @ (I3 - w_x * dt) * dt2)
    F = F.at[0:3, 6:9].set(I3 * dt)
    F = F.at[0:3, 9:12].set(-0.25 * (R0 + R1) * dt2)
    F = F.at[0:3, 12:15].set(0.25 * R1 @ a1_x * dt2 * dt)
    F = F.at[3:6, 3:6].set(I3 - w_x * dt)
    F = F.at[3:6, 12:15].set(-I3 * dt)
    F = F.at[6:9, 3:6].set(
        -0.5 * R0 @ a0_x * dt
        + -0.5 * R1 @ a1_x @ (I3 - w_x * dt) * dt)
    F = F.at[6:9, 6:9].set(I3)
    F = F.at[6:9, 9:12].set(-0.5 * (R0 + R1) * dt)
    F = F.at[6:9, 12:15].set(0.5 * R1 @ a1_x * dt * dt)
    F = F.at[9:12, 9:12].set(I3)
    F = F.at[12:15, 12:15].set(I3)

    V = jnp.zeros((15, 18), dtype=dtype)
    V = V.at[0:3, 0:3].set(0.25 * R0 * dt2)
    V = V.at[0:3, 3:6].set(-0.125 * R1 @ a1_x * dt2 * dt)
    V = V.at[0:3, 6:9].set(0.25 * R1 * dt2)
    V = V.at[0:3, 9:12].set(-0.125 * R1 @ a1_x * dt2 * dt)
    V = V.at[3:6, 3:6].set(0.5 * I3 * dt)
    V = V.at[3:6, 9:12].set(0.5 * I3 * dt)
    V = V.at[6:9, 0:3].set(0.5 * R0 * dt)
    V = V.at[6:9, 3:6].set(-0.25 * R1 @ a1_x * dt * dt)
    V = V.at[6:9, 6:9].set(0.5 * R1 * dt)
    V = V.at[6:9, 9:12].set(-0.25 * R1 @ a1_x * dt * dt)
    V = V.at[9:12, 12:15].set(I3 * dt)
    V = V.at[12:15, 15:18].set(I3 * dt)

    return new_delta_p, new_delta_q, new_delta_v, F, V


def _step_matrices(R0, R1, un_gyr, a0, a1, dt):
    """Batched (F, V) transition/noise matrices for midpoint steps.

    Same algebra as `midpoint_step` (integration_base.h:70-143) but
    assembled from [...,3,3] blocks so an entire interval's matrices
    build as a handful of batched ops. dt==0 yields F=I, V=0 (the
    masked-step no-op)."""
    dtype = R0.dtype
    I3 = jnp.broadcast_to(jnp.eye(3, dtype=dtype), R0.shape)
    Z3 = jnp.zeros_like(I3)
    w_x = lie.hat(un_gyr)
    a0_x = lie.hat(a0)
    a1_x = lie.hat(a1)
    dt_ = dt[..., None, None]
    dt2 = dt_ * dt_
    ImW = I3 - w_x * dt_
    R0a0 = R0 @ a0_x
    R1a1 = R1 @ a1_x

    def rows(blocks):
        return jnp.concatenate(
            [jnp.concatenate(r, axis=-1) for r in blocks], axis=-2)

    F = rows([
        [I3, -0.25 * R0a0 * dt2 - 0.25 * (R1a1 @ ImW) * dt2, I3 * dt_,
         -0.25 * (R0 + R1) * dt2, 0.25 * R1a1 * dt2 * dt_],
        [Z3, ImW, Z3, Z3, -I3 * dt_],
        [Z3, -0.5 * R0a0 * dt_ - 0.5 * (R1a1 @ ImW) * dt_, I3,
         -0.5 * (R0 + R1) * dt_, 0.5 * R1a1 * dt2],
        [Z3, Z3, Z3, I3, Z3],
        [Z3, Z3, Z3, Z3, I3],
    ])
    V = rows([
        [0.25 * R0 * dt2, -0.125 * R1a1 * dt2 * dt_, 0.25 * R1 * dt2,
         -0.125 * R1a1 * dt2 * dt_, Z3, Z3],
        [Z3, 0.5 * I3 * dt_, Z3, 0.5 * I3 * dt_, Z3, Z3],
        [0.5 * R0 * dt_, -0.25 * R1a1 * dt2, 0.5 * R1 * dt_,
         -0.25 * R1a1 * dt2, Z3, Z3],
        [Z3, Z3, Z3, Z3, I3 * dt_, Z3],
        [Z3, Z3, Z3, Z3, Z3, I3 * dt_],
    ])
    return F, V


def preintegrate(acc, gyr, dt, linearized_ba, linearized_bg,
                 noise: ImuNoise = ImuNoise(),
                 valid_mask=None) -> Preintegration:
    """Integrate a sequence of IMU samples into one Preintegration.

    acc, gyr: [N+1, 3] samples (sample i and i+1 bracket step i).
    dt: [N] step durations. valid_mask: optional [N] bool — masked steps
    are skipped (dt treated as 0), enabling fixed-capacity buffers.

    Scan-free: quaternion prefix product + cumsums + an associative
    scan over the affine covariance recursion (module docstring) — the
    recursion X' = F X Fᵀ + G composes as
    (A1, C1) ∘ (A2, C2) = (A2 A1, A2 C1 A2ᵀ + C2).
    """
    dtype = acc.dtype
    n_steps = dt.shape[0]
    if n_steps == 0:
        return Preintegration(
            jnp.zeros(3, dtype), lie.quat_identity(dtype),
            jnp.zeros(3, dtype), jnp.eye(15, dtype=dtype),
            jnp.zeros((15, 15), dtype=dtype), jnp.zeros((), dtype),
            linearized_ba, linearized_bg)
    a0 = acc[:-1] - linearized_ba
    a1 = acc[1:] - linearized_ba
    un_gyr = 0.5 * (gyr[:-1] + gyr[1:]) - linearized_bg
    if valid_mask is not None:
        # dt=0 makes a masked step an exact no-op (F=I, V=0, zero
        # increments) — but only if its padded samples are finite, so
        # sanitize them too (0 * garbage would still poison the sums)
        dt = jnp.where(valid_mask, dt, 0.0)
        vm = valid_mask[:, None]
        a0 = jnp.where(vm, a0, 0.0)
        a1 = jnp.where(vm, a1, 0.0)
        un_gyr = jnp.where(vm, un_gyr, 0.0)

    # rotations: prefix product of per-step exponentials
    e = lie.so3_exp_quat(un_gyr * dt[:, None])
    q_after = lie.quat_normalize(
        jax.lax.associative_scan(lie.quat_multiply, e))
    q_before = jnp.concatenate(
        [lie.quat_identity(dtype)[None], q_after[:-1]], axis=0)

    # velocity/position: elementwise + cumsum once rotations are known
    un_acc = 0.5 * (lie.quat_rotate(q_before, a0)
                    + lie.quat_rotate(q_after, a1))
    dv_inc = un_acc * dt[:, None]
    v_after = jnp.cumsum(dv_inc, axis=0)
    v_before = v_after - dv_inc
    dp_inc = v_before * dt[:, None] + 0.5 * un_acc * (dt * dt)[:, None]

    # jacobian/covariance: affine pair scan over batched (F, G)
    R0 = lie.quat_to_matrix(q_before)
    R1 = lie.quat_to_matrix(q_after)
    F, V = _step_matrices(R0, R1, un_gyr, a0, a1, dt)
    qdiag = jnp.diagonal(_noise_matrix(noise, dtype))
    G = (V * qdiag) @ jnp.swapaxes(V, -1, -2)

    def comb(x, y):
        A1, C1 = x
        A2, C2 = y
        A2T = jnp.swapaxes(A2, -1, -2)
        return A2 @ A1, A2 @ C1 @ A2T + C2

    A_pre, C_pre = jax.lax.associative_scan(comb, (F, G))
    return Preintegration(
        jnp.sum(dp_inc, axis=0), q_after[-1], v_after[-1],
        A_pre[-1], C_pre[-1], jnp.sum(dt),
        linearized_ba, linearized_bg)


def preintegrate_sequential(acc, gyr, dt, linearized_ba, linearized_bg,
                            noise: ImuNoise = ImuNoise(),
                            valid_mask=None) -> Preintegration:
    """Reference `lax.scan` implementation (one `midpoint_step` per
    sample) — kept as the ground truth the associative-scan
    `preintegrate` is tested against."""
    dtype = acc.dtype
    n_steps = dt.shape[0]
    if valid_mask is None:
        valid_mask = jnp.ones((n_steps,), dtype=bool)
    dt = jnp.where(valid_mask, dt, 0.0)

    Q = _noise_matrix(noise, dtype)

    def step(carry, inputs):
        delta_p, delta_q, delta_v, jac, cov, sum_dt = carry
        acc0, gyr0, acc1, gyr1, dt_i, valid = inputs
        ndp, ndq, ndv, F, V = midpoint_step(
            delta_p, delta_q, delta_v, linearized_ba, linearized_bg,
            acc0, gyr0, acc1, gyr1, dt_i)
        njac = F @ jac
        ncov = F @ cov @ F.T + V @ Q @ V.T
        # masked steps: carry through unchanged
        keep = lambda new, old: jnp.where(valid, new, old)
        carry = (keep(ndp, delta_p), keep(ndq, delta_q), keep(ndv, delta_v),
                 keep(njac, jac), keep(ncov, cov), sum_dt + dt_i)
        return carry, None

    init = (jnp.zeros(3, dtype), lie.quat_identity(dtype),
            jnp.zeros(3, dtype), jnp.eye(15, dtype=dtype),
            jnp.zeros((15, 15), dtype=dtype), jnp.zeros((), dtype))
    inputs = (acc[:-1], gyr[:-1], acc[1:], gyr[1:], dt, valid_mask)
    (delta_p, delta_q, delta_v, jac, cov, sum_dt), _ = jax.lax.scan(
        step, init, inputs)
    return Preintegration(delta_p, delta_q, delta_v, jac, cov, sum_dt,
                          linearized_ba, linearized_bg)


def evaluate(pre: Preintegration,
             p_i, q_i, v_i, ba_i, bg_i,
             p_j, q_j, v_j, ba_j, bg_j,
             gravity=GRAVITY):
    """Bias-corrected 15-dim preintegration residual.

    Mirrors `IntegrationBase::evaluate` (integration_base.h:175-204).
    Differentiable in all inputs — factor Jacobians come from jacfwd over
    the tangent increments in the solver.
    """
    dba = ba_i - pre.linearized_ba
    dbg = bg_i - pre.linearized_bg

    corrected_q = lie.quat_multiply(
        pre.delta_q, lie.so3_exp_quat(pre.dq_dbg @ dbg))
    corrected_v = pre.delta_v + pre.dv_dba @ dba + pre.dv_dbg @ dbg
    corrected_p = pre.delta_p + pre.dp_dba @ dba + pre.dp_dbg @ dbg

    g = jnp.asarray(gravity, dtype=p_i.dtype)
    q_i_inv = lie.quat_conjugate(q_i)
    sum_dt = pre.sum_dt

    r_p = lie.quat_rotate(
        q_i_inv, 0.5 * g * sum_dt * sum_dt + p_j - p_i - v_i * sum_dt
    ) - corrected_p
    r_q = 2.0 * lie.quat_multiply(
        lie.quat_conjugate(corrected_q), lie.quat_multiply(q_i_inv, q_j)
    )[..., 1:]
    r_v = lie.quat_rotate(q_i_inv, g * sum_dt + v_j - v_i) - corrected_v
    r_ba = ba_j - ba_i
    r_bg = bg_j - bg_i
    return jnp.concatenate([r_p, r_q, r_v, r_ba, r_bg], axis=-1)


def propagate_state(p, q, v, ba, bg, acc0, gyr0, acc1, gyr1, dt,
                    gravity=GRAVITY):
    """World-frame midpoint state propagation for one IMU step.

    Mirrors the forward propagation in `Estimator::ProcessIMU`
    (estimator.cpp:834-842) / `FastPredictIMU` (estimator.cpp:1376).
    """
    g = jnp.asarray(gravity, dtype=p.dtype)
    un_acc_0 = lie.quat_rotate(q, acc0 - ba) - g
    un_gyr = 0.5 * (gyr0 + gyr1) - bg
    q_new = lie.quat_normalize(
        lie.quat_multiply(q, lie.so3_exp_quat(un_gyr * dt)))
    un_acc_1 = lie.quat_rotate(q_new, acc1 - ba) - g
    un_acc = 0.5 * (un_acc_0 + un_acc_1)
    p_new = p + v * dt + 0.5 * un_acc * dt * dt
    v_new = v + un_acc * dt
    return p_new, q_new, v_new
