"""Synthetic VIO world: analytic trajectory, exact IMU, landmark projections.

Replaces dataset-dependent testing for the core estimator: an analytic
smooth trajectory gives *exact* velocity/acceleration/angular-rate via JAX
autodiff, so IMU preintegration and BA can be validated to numerical
precision without EuRoC/KITTI on disk. Also used by `bench.py`.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from dynamic_vins_tpu.geometry import lie
from dynamic_vins_tpu.geometry.camera import PinholeIntrinsics, project
from dynamic_vins_tpu.imu.preintegration import GRAVITY


class TrajectoryParams(NamedTuple):
    radius: float = 5.0
    omega: float = 0.6          # rad/s around the circle
    z_amp: float = 0.6
    z_omega: float = 1.1
    roll_amp: float = 0.12
    pitch_amp: float = 0.1
    rp_omega: float = 1.7


def position(t, p: TrajectoryParams = TrajectoryParams()):
    t = jnp.asarray(t)
    return jnp.stack([
        p.radius * jnp.cos(p.omega * t),
        p.radius * jnp.sin(p.omega * t),
        p.z_amp * jnp.sin(p.z_omega * t),
    ], axis=-1)


def orientation(t, p: TrajectoryParams = TrajectoryParams()):
    """Body-to-world quaternion: yaw follows the tangent, small roll/pitch."""
    t = jnp.asarray(t)
    yaw = p.omega * t + jnp.pi / 2.0
    roll = p.roll_amp * jnp.sin(p.rp_omega * t)
    pitch = p.pitch_amp * jnp.cos(p.rp_omega * t)
    qz = lie.quat_from_yaw(yaw)
    qy = lie.so3_exp_quat(jnp.stack(
        [jnp.zeros_like(t), pitch, jnp.zeros_like(t)], axis=-1))
    qx = lie.so3_exp_quat(jnp.stack(
        [roll, jnp.zeros_like(t), jnp.zeros_like(t)], axis=-1))
    return lie.quat_multiply(qz, lie.quat_multiply(qy, qx))


def _derivative(fn, t):
    out, dot = jax.jvp(fn, (t,), (jnp.ones_like(t),))
    return out, dot


def state_at(t, p: TrajectoryParams = TrajectoryParams()):
    """(pos, quat, vel) at scalar or batched t."""
    pos, vel = _derivative(lambda s: position(s, p), t)
    q = orientation(t, p)
    return pos, q, vel


def imu_at(t, p: TrajectoryParams = TrajectoryParams(), gravity=GRAVITY):
    """Exact body-frame IMU measurements (accel specific force, gyro)."""
    _, vel_fn_dot = _derivative(lambda s: position(s, p), t)

    def vel(s):
        return _derivative(lambda u: position(u, p), s)[1]

    _, acc_w = _derivative(vel, t)
    q, qdot = _derivative(lambda s: orientation(s, p), t)
    omega_body = 2.0 * lie.quat_multiply(lie.quat_conjugate(q), qdot)[..., 1:]
    g = jnp.asarray(gravity, dtype=acc_w.dtype)
    acc_body = lie.quat_rotate(lie.quat_conjugate(q), acc_w + g)
    return acc_body, omega_body


def make_landmarks(n: int, seed: int = 0,
                   p: TrajectoryParams = TrajectoryParams()):
    """Random landmarks in a shell around the trajectory circle."""
    rng = np.random.default_rng(seed)
    r = rng.uniform(p.radius + 2.0, p.radius + 12.0, size=n)
    th = rng.uniform(0, 2 * np.pi, size=n)
    z = rng.uniform(-3.0, 5.0, size=n)
    pts = np.stack([r * np.cos(th), r * np.sin(th), z], axis=-1)
    return jnp.asarray(pts)


class StereoRig(NamedTuple):
    intr: PinholeIntrinsics
    # camera-to-body extrinsics (left cam): p_bc, q_bc
    p_bc: jnp.ndarray
    q_bc: jnp.ndarray
    baseline: float = 0.11
    width: int = 752
    height: int = 480

    @classmethod
    def default(cls, dtype=None):
        dtype = jax.dtypes.canonicalize_dtype(dtype or jnp.float64)
        intr = PinholeIntrinsics.make(458.65, 457.30, 367.2, 248.4,
                                      dtype=dtype)
        # camera looks forward along body +x: R_bc maps cam z->body x,
        # cam x->body -y, cam y->body -z
        R_bc = jnp.asarray([[0.0, 0.0, 1.0],
                            [-1.0, 0.0, 0.0],
                            [0.0, -1.0, 0.0]], dtype=dtype)
        return cls(intr, jnp.zeros(3, dtype=dtype),
                   lie.matrix_to_quat(R_bc))

    def right_extrinsics(self):
        """Right camera extrinsics: translated along cam x by +baseline."""
        dp = lie.quat_rotate(self.q_bc, jnp.asarray(
            [self.baseline, 0.0, 0.0], dtype=self.p_bc.dtype))
        return self.p_bc + dp, self.q_bc


def observe(rig: StereoRig, p_wb, q_wb, landmarks, cam: int = 0):
    """Project landmarks into the (left|right) camera at body pose.

    Returns (uv [N,2], in_view mask [N], pts_cam [N,3]).
    """
    if cam == 0:
        p_bc, q_bc = rig.p_bc, rig.q_bc
    else:
        p_bc, q_bc = rig.right_extrinsics()
    p_wc, q_wc = lie.pose_compose(p_wb, q_wb, p_bc, q_bc)
    p_cw, q_cw = lie.pose_inverse(p_wc, q_wc)
    pts_cam = lie.pose_transform_point(
        p_cw[..., None, :], q_cw[..., None, :], landmarks)
    uv = project(rig.intr, pts_cam)
    in_view = ((pts_cam[..., 2] > 0.3)
               & (uv[..., 0] >= 0) & (uv[..., 0] < rig.width)
               & (uv[..., 1] >= 0) & (uv[..., 1] < rig.height))
    return uv, in_view, pts_cam


class SyntheticSequence(NamedTuple):
    """A generated VIO sequence with exact ground truth."""

    frame_times: jnp.ndarray        # [F]
    gt_p: jnp.ndarray               # [F,3]
    gt_q: jnp.ndarray               # [F,4]
    gt_v: jnp.ndarray               # [F,3]
    imu_times: jnp.ndarray          # [M]
    acc: jnp.ndarray                # [M,3] (noisy)
    gyr: jnp.ndarray                # [M,3]
    landmarks: jnp.ndarray          # [L,3]
    rig: StereoRig


def generate_sequence(num_frames: int = 40, frame_hz: float = 10.0,
                      imu_hz: float = 200.0, num_landmarks: int = 300,
                      acc_noise: float = 0.0, gyr_noise: float = 0.0,
                      acc_bias=(0.0, 0.0, 0.0), gyr_bias=(0.0, 0.0, 0.0),
                      seed: int = 0,
                      params: TrajectoryParams = TrajectoryParams(),
                      dtype=None) -> SyntheticSequence:
    dtype = jax.dtypes.canonicalize_dtype(dtype or jnp.float64)
    rng = np.random.default_rng(seed)
    frame_times = jnp.arange(num_frames, dtype=dtype) / frame_hz
    imu_per_frame = int(round(imu_hz / frame_hz))
    imu_times = jnp.arange(
        (num_frames - 1) * imu_per_frame + 1, dtype=dtype) / imu_hz

    gt_p, gt_q, gt_v = jax.vmap(lambda t: state_at(t, params))(frame_times)
    acc, gyr = jax.vmap(lambda t: imu_at(t, params))(imu_times)
    acc = acc + jnp.asarray(acc_bias, dtype=dtype)
    gyr = gyr + jnp.asarray(gyr_bias, dtype=dtype)
    if acc_noise > 0:
        acc = acc + jnp.asarray(
            rng.normal(scale=acc_noise, size=acc.shape), dtype=dtype)
    if gyr_noise > 0:
        gyr = gyr + jnp.asarray(
            rng.normal(scale=gyr_noise, size=gyr.shape), dtype=dtype)

    rig = StereoRig.default(dtype=dtype)
    landmarks = make_landmarks(num_landmarks, seed=seed).astype(dtype)
    return SyntheticSequence(frame_times, gt_p, gt_q, gt_v, imu_times,
                             acc, gyr, landmarks, rig)
