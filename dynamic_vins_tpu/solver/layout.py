"""Fixed-capacity sliding-window state layout for the BA solver.

The reference packs Ceres parameter blocks as pose[11]x7, speedbias[11]x9,
extrinsic[2]x7, td[1] plus per-landmark inverse depths
(`estimator/body.h:55-94`, `vio_parameters.h:25-33`). Here the same state
is one pytree of fixed-shape arrays, and the solver works in the tangent
space: a flat delta vector of `cam_dim(W)` camera-side dims plus one
inverse-depth dim per landmark slot, applied via `boxplus`.

Column layout of the camera-side tangent vector (W = window size):
  [0,          6W)    pose blocks        (dp 3, dtheta 3) x W
  [6W,         15W)   speed/bias blocks  (dv 3, dba 3, dbg 3) x W
  [15W,        15W+12) extrinsic blocks  (dp 3, dtheta 3) x 2 cams
  [15W+12,     15W+13) time offset td
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from dynamic_vins_tpu.geometry import lie
from dynamic_vins_tpu.utils import precision

# Reference constants (parameters.h:42-44, vio_parameters.h:25-33)
WINDOW_SIZE = 10          # keyframes; states = WINDOW_SIZE + 1
NUM_FRAMES = WINDOW_SIZE + 1


def cam_dim(num_frames: int = NUM_FRAMES) -> int:
    return 15 * num_frames + 13


def pose_col(k):
    return 6 * k


def speedbias_col(k, num_frames: int = NUM_FRAMES):
    return 6 * num_frames + 9 * k


def extrinsic_col(cam, num_frames: int = NUM_FRAMES):
    return 15 * num_frames + 6 * cam


def td_col(num_frames: int = NUM_FRAMES):
    return 15 * num_frames + 12


def plane_constraint_cols(num_frames: int = NUM_FRAMES,
                          constrain_speed: bool = True):
    """Tangent dims fixed under the planar-motion constraint.

    Capability parity with the reference's constrained local
    parameterizations (`factor/pose_local_parameterization.h:38`
    PoseConstraintLocalParameterization: zero z / roll / pitch updates;
    `:50` SpeedConstraintLocalParameterization: zero vz). Returns a
    bool [cam_dim] mask to OR into `BAProblem.fixed_cols`.
    """
    import numpy as np

    fixed = np.zeros(cam_dim(num_frames), bool)
    for k in range(num_frames):
        c = pose_col(k)
        fixed[c + 2] = True          # dp_z (world)
        fixed[c + 3] = True          # dtheta_x (roll, body tangent)
        fixed[c + 4] = True          # dtheta_y (pitch)
        if constrain_speed:
            fixed[speedbias_col(k, num_frames) + 2] = True   # dv_z
    return fixed


class WindowState(NamedTuple):
    """Full camera-side state of the sliding window (one pytree)."""

    p: jnp.ndarray       # [F,3] body positions (world)
    q: jnp.ndarray       # [F,4] body orientations (wxyz, body->world)
    v: jnp.ndarray       # [F,3] velocities (world)
    ba: jnp.ndarray      # [F,3] accel biases
    bg: jnp.ndarray      # [F,3] gyro biases
    p_bc: jnp.ndarray    # [2,3] camera-to-body translations
    q_bc: jnp.ndarray    # [2,4] camera-to-body rotations
    td: jnp.ndarray      # [] camera-IMU time offset

    @property
    def num_frames(self):
        return self.p.shape[0]

    @classmethod
    def identity(cls, num_frames: int = NUM_FRAMES, dtype=None):
        dtype = dtype or precision.default_float()
        qid = jnp.tile(lie.quat_identity(dtype), (num_frames, 1))
        qbc = jnp.tile(lie.quat_identity(dtype), (2, 1))
        z3 = jnp.zeros((num_frames, 3), dtype)
        return cls(z3, qid, z3, z3, z3, jnp.zeros((2, 3), dtype), qbc,
                   jnp.zeros((), dtype))

    def boxplus(self, delta):
        """Apply a cam_dim tangent vector (jit/vjp/jvp-safe)."""
        F = self.num_frames
        d = delta
        dp = d[: 6 * F].reshape(F, 6)
        p_new, q_new = lie.pose_boxplus(self.p, self.q, dp)
        dsb = d[6 * F: 15 * F].reshape(F, 9)
        v_new = self.v + dsb[:, 0:3]
        ba_new = self.ba + dsb[:, 3:6]
        bg_new = self.bg + dsb[:, 6:9]
        dex = d[15 * F: 15 * F + 12].reshape(2, 6)
        pbc_new, qbc_new = lie.pose_boxplus(self.p_bc, self.q_bc, dex)
        td_new = self.td + d[15 * F + 12]
        return WindowState(p_new, q_new, v_new, ba_new, bg_new,
                           pbc_new, qbc_new, td_new)

    # ------------------------------------------------------------------
    # packed single-array form (ONE host<->device transfer per stage —
    # per-leaf transfers dominate latency on remote-attached TPUs)
    # ------------------------------------------------------------------
    def pack(self):
        import numpy as _np

        F = self.num_frames
        xp = _np if type(self.p) is _np.ndarray else jnp
        return xp.concatenate([
            xp.ravel(self.p), xp.ravel(self.q), xp.ravel(self.v),
            xp.ravel(self.ba), xp.ravel(self.bg), xp.ravel(self.p_bc),
            xp.ravel(self.q_bc), xp.reshape(self.td, (1,))])

    @classmethod
    def unpack(cls, flat, num_frames: int):
        F = num_frames
        sizes = [3 * F, 4 * F, 3 * F, 3 * F, 3 * F, 6, 8, 1]
        offs = [0]
        for s in sizes:
            offs.append(offs[-1] + s)
        seg = lambda i: flat[offs[i]:offs[i + 1]]
        return cls(seg(0).reshape(F, 3), seg(1).reshape(F, 4),
                   seg(2).reshape(F, 3), seg(3).reshape(F, 3),
                   seg(4).reshape(F, 3), seg(5).reshape(2, 3),
                   seg(6).reshape(2, 4), seg(7).reshape(()))

    def boxminus(self, other: "WindowState"):
        """Tangent vector with other ⊞ delta = self."""
        F = self.num_frames
        dpose = lie.pose_boxminus(self.p, self.q, other.p, other.q)
        dsb = jnp.concatenate(
            [self.v - other.v, self.ba - other.ba, self.bg - other.bg],
            axis=-1)
        dex = lie.pose_boxminus(self.p_bc, self.q_bc,
                                other.p_bc, other.q_bc)
        return jnp.concatenate([
            dpose.reshape(6 * F), dsb.reshape(9 * F), dex.reshape(12),
            (self.td - other.td)[None]])
