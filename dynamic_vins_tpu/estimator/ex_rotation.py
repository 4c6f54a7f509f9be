"""Camera-IMU extrinsic rotation self-calibration (hand-eye).

Capability parity with the reference's ``InitialEXRotation``
(`estimator/initial/initial_ex_rotation.h:34`, impl
`initial_ex_rotation.cpp`): given per-interval relative camera
rotations q_c (from epipolar geometry on tracked correspondences) and
relative body rotations q_b (gyro preintegration deltas) over the same
intervals, recover the camera->body rotation q_bc from the hand-eye
constraint

    q_b ⊗ q_bc = q_bc ⊗ q_c        (R_b = R_bc R_c R_bcᵀ).

TPU-first formulation: all K pairs form ONE stacked [4K, 4] linear
system A q = 0 with A_k = L(q_b_k) − R(q_c_k); robust Huber weights on
the angular disagreement under the current estimate are re-applied for
a fixed number of IRLS rounds inside a single jitted function (no
data-dependent Python control flow); the solution per round is the
smallest right singular vector of the weighted stack (one small SVD —
negligible next to the MXU work elsewhere). Convergence mirrors the
reference's singular-value gap test (second-smallest σ > 0.25,
`initial_ex_rotation.cpp` CalibrationExRotation tail).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from dynamic_vins_tpu.geometry import lie

PAIR_CAPACITY = 64


def quat_left(q):
    """L(q) with q w-first: L(q1) @ q2 == q1 ⊗ q2."""
    w = q[..., 0]
    x, y, z = q[..., 1], q[..., 2], q[..., 3]
    row = lambda *e: jnp.stack(e, axis=-1)
    return jnp.stack([
        row(w, -x, -y, -z),
        row(x, w, -z, y),
        row(y, z, w, -x),
        row(z, -y, x, w),
    ], axis=-2)


def quat_right(q):
    """R(q) with q w-first: R(q2) @ q1 == q1 ⊗ q2."""
    w = q[..., 0]
    x, y, z = q[..., 1], q[..., 2], q[..., 3]
    row = lambda *e: jnp.stack(e, axis=-1)
    return jnp.stack([
        row(w, -x, -y, -z),
        row(x, w, z, -y),
        row(y, -z, w, x),
        row(z, y, -x, w),
    ], axis=-2)


def _angular_deg(q_b, q_c, q_est):
    """Angle (deg) between q_c and the q_est-predicted camera rotation."""
    q_pred = lie.quat_multiply(
        lie.quat_multiply(lie.quat_conjugate(q_est)[None, :], q_b),
        q_est[None, :])
    q_rel = lie.quat_multiply(lie.quat_conjugate(q_pred), q_c)
    ang = 2.0 * jnp.arctan2(jnp.linalg.norm(q_rel[..., 1:], axis=-1),
                            jnp.abs(q_rel[..., 0]))
    return ang * (180.0 / jnp.pi)


@functools.partial(jax.jit, static_argnames=("rounds",))
def calibrate_rotation(q_b, q_c, valid, rounds: int = 4):
    """Solve the hand-eye rotation from K masked pairs.

    q_b, q_c: [K,4] w-first unit quaternions; valid: [K] bool.
    Returns (q_bc [4], singular_values [4] descending, converged []).
    """
    dtype = q_b.dtype
    A0 = quat_left(q_b) - quat_right(q_c)              # [K,4,4]
    vmask = valid.astype(dtype)

    def body(q_est, _):
        ang = _angular_deg(q_b, q_c, q_est)
        # reference Huber: unit weight below 5 deg, 5/angle above
        w = jnp.where(ang > 5.0, 5.0 / jnp.maximum(ang, 5.0), 1.0)
        A = (A0 * (w * vmask)[:, None, None]).reshape(-1, 4)
        _, s, vh = jnp.linalg.svd(A, full_matrices=False)
        q = vh[-1]
        q = jnp.where(q[0] < 0, -q, q)
        return lie.quat_normalize(q), s

    q0 = lie.quat_identity(dtype)
    q_bc, svals = jax.lax.scan(body, q0, None, length=rounds)
    s_last = svals[-1]
    # convergence = the reference's singular-value-gap test PLUS a
    # residual-consistency gate: a well-conditioned null space can still
    # be a bad fit (e.g. stale/zero gyro deltas make the system look
    # observable while every pair disagrees by the full rotation angle)
    ang = _angular_deg(q_b, q_c, q_bc)
    w = jnp.where(ang > 5.0, 5.0 / jnp.maximum(ang, 5.0), 1.0) * vmask
    mean_resid = jnp.sum(w * ang) / jnp.maximum(jnp.sum(vmask), 1.0)
    converged = ((s_last[2] > 0.25) & (jnp.sum(vmask) >= 10)
                 & (mean_resid < 2.0))
    return q_bc, s_last, converged


class ExRotationCalibrator:
    """Host-side pair accumulator + converged-rotation cache.

    Mirrors the reference's usage: one (q_c, q_b) pair pushed per new
    frame during startup; calibration re-solved each push until the
    singular-value gap indicates a well-conditioned estimate."""

    def __init__(self, capacity: int = PAIR_CAPACITY,
                 dtype=jnp.float32):
        self.capacity = capacity
        self.dtype = dtype
        self.q_b = np.zeros((capacity, 4))
        self.q_c = np.zeros((capacity, 4))
        self.q_b[:, 0] = 1.0
        self.q_c[:, 0] = 1.0
        self.n = 0
        self.result = None            # np [4] once converged

    def push(self, q_b, q_c) -> None:
        i = self.n % self.capacity
        self.q_b[i] = np.asarray(q_b)
        self.q_c[i] = np.asarray(q_c)
        self.n += 1

    def solve(self):
        """(q_bc, converged) from all pairs seen so far."""
        valid = np.arange(self.capacity) < self.n
        q_bc, svals, conv = calibrate_rotation(
            jnp.asarray(self.q_b, self.dtype),
            jnp.asarray(self.q_c, self.dtype),
            jnp.asarray(valid))
        conv = bool(conv)
        if conv:
            self.result = np.asarray(q_bc)
        return np.asarray(q_bc), conv
