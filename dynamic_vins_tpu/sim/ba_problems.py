"""Build synthetic sliding-window BA problems from the simulator.

Produces ground-truth `WindowState` + observation tables in the solver's
fixed-capacity format, mirroring how the reference frontend feeds the
estimator (anchor at first observation; mono two-frame, stereo
one-frame, and stereo two-frame observation rows — the three projection
factor variants of `estimator/estimator.cpp:109-214`).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from dynamic_vins_tpu.factors import prior as prior_factor
from dynamic_vins_tpu.factors.projection import ProjObs
from dynamic_vins_tpu.geometry import lie
from dynamic_vins_tpu.imu import preintegration as pre
from dynamic_vins_tpu.sim import synthetic as sim
from dynamic_vins_tpu.solver import gauss_newton as gn
from dynamic_vins_tpu.utils import precision
from dynamic_vins_tpu.solver import layout


class SyntheticBA(NamedTuple):
    gt_state: layout.WindowState
    gt_inv_depth: jnp.ndarray
    problem: gn.BAProblem
    seq: sim.SyntheticSequence


def build(num_frames: int = 6, num_landmarks: int = 120,
          obs_capacity: int = 4096, lm_capacity: int = 256,
          pixel_noise: float = 0.0, seed: int = 0,
          imu_hz: float = 200.0, frame_hz: float = 10.0,
          stereo: bool = True, fix_first_pose: bool = True,
          dtype=None) -> SyntheticBA:
    dtype = dtype or precision.default_float()
    dtype = jax.dtypes.canonicalize_dtype(dtype)
    seq = sim.generate_sequence(num_frames=num_frames, frame_hz=frame_hz,
                                imu_hz=imu_hz,
                                num_landmarks=num_landmarks,
                                seed=seed, dtype=dtype)
    rig = seq.rig
    F = num_frames
    rng = np.random.default_rng(seed + 1)

    # visibility per frame/cam
    uv_l, vis_l, ptc_l = sim.observe(rig, seq.gt_p, seq.gt_q,
                                     seq.landmarks, cam=0)
    uv_r, vis_r, ptc_r = sim.observe(rig, seq.gt_p, seq.gt_q,
                                     seq.landmarks, cam=1)
    vis_l = np.asarray(vis_l)
    vis_r = np.asarray(vis_r)
    ptc_l = np.asarray(ptc_l)
    ptc_r = np.asarray(ptc_r)

    # normalized coords (+ optional pixel noise mapped via focal length)
    def norm_pt(ptc, noise):
        xy = ptc[..., :2] / ptc[..., 2:3]
        if pixel_noise > 0:
            xy = xy + noise / 460.0
        return np.concatenate([xy, np.ones_like(xy[..., :1])], axis=-1)

    noise_l = rng.normal(scale=pixel_noise, size=ptc_l[..., :2].shape)
    noise_r = rng.normal(scale=pixel_noise, size=ptc_r[..., :2].shape)
    pts_l = norm_pt(ptc_l, noise_l)
    pts_r = norm_pt(ptc_r, noise_r)

    rows = {k: [] for k in ("fi", "fj", "cj", "lm", "pi", "pj")}
    lm_slot = {}
    gt_inv_depth = np.zeros(lm_capacity)
    lm_valid = np.zeros(lm_capacity, bool)

    def add_row(fi, fj, cj, slot, pi, pj):
        rows["fi"].append(fi)
        rows["fj"].append(fj)
        rows["cj"].append(cj)
        rows["lm"].append(slot)
        rows["pi"].append(pi)
        rows["pj"].append(pj)

    next_slot = 0
    for l in range(num_landmarks):
        frames_seen = [k for k in range(F) if vis_l[k, l]]
        if len(frames_seen) < 2:
            continue
        if next_slot >= lm_capacity:
            break
        anchor = frames_seen[0]
        slot = next_slot
        next_slot += 1
        lm_slot[l] = slot
        gt_inv_depth[slot] = 1.0 / ptc_l[anchor, l, 2]
        lm_valid[slot] = True
        pi = pts_l[anchor, l]
        for k in frames_seen[1:]:
            add_row(anchor, k, 0, slot, pi, pts_l[k, l])
            if stereo and vis_r[k, l]:
                add_row(anchor, k, 1, slot, pi, pts_r[k, l])
        if stereo and vis_r[anchor, l]:
            add_row(anchor, anchor, 1, slot, pi, pts_r[anchor, l])

    n = len(rows["fi"])
    assert n <= obs_capacity, f"{n} rows exceed capacity {obs_capacity}"
    obs = ProjObs.empty(obs_capacity, dtype=dtype)
    idx = np.arange(n)
    obs = obs._replace(
        frame_i=obs.frame_i.at[idx].set(np.asarray(rows["fi"], np.int32)),
        frame_j=obs.frame_j.at[idx].set(np.asarray(rows["fj"], np.int32)),
        cam_j=obs.cam_j.at[idx].set(np.asarray(rows["cj"], np.int32)),
        lm=obs.lm.at[idx].set(np.asarray(rows["lm"], np.int32)),
        pt_i=obs.pt_i.at[idx].set(np.asarray(rows["pi"])),
        pt_j=obs.pt_j.at[idx].set(np.asarray(rows["pj"])),
        valid=obs.valid.at[idx].set(True),
    )

    # IMU preintegrations per window edge
    ipf = int(round(imu_hz / frame_hz))
    zeros = jnp.zeros(3, dtype=dtype)

    def edge(k):
        a, b = k * ipf, (k + 1) * ipf
        return pre.preintegrate(seq.acc[a:b + 1], seq.gyr[a:b + 1],
                                jnp.diff(seq.imu_times[a:b + 1]),
                                zeros, zeros)


    pres = jax.tree.map(lambda *xs: jnp.stack(xs),
                        *[edge(k) for k in range(F - 1)])
    imu_valid = jnp.ones((F - 1,), bool)

    gt_v = jnp.stack([sim.state_at(t)[2] for t in seq.frame_times])

    gt_state = layout.WindowState(
        p=seq.gt_p, q=seq.gt_q, v=gt_v,
        ba=jnp.zeros((F, 3), dtype), bg=jnp.zeros((F, 3), dtype),
        p_bc=jnp.stack([rig.p_bc, rig.right_extrinsics()[0]]),
        q_bc=jnp.stack([rig.q_bc, rig.right_extrinsics()[1]]),
        td=jnp.zeros((), dtype))

    D = layout.cam_dim(F)
    fixed = np.zeros(D, bool)
    # never estimate extrinsics/td in synthetic problems
    fixed[layout.extrinsic_col(0, F):layout.td_col(F) + 1] = True
    if fix_first_pose:
        fixed[layout.pose_col(0):layout.pose_col(0) + 6] = True

    problem = gn.BAProblem(
        obs=obs, pres=pres, imu_valid=imu_valid,
        prior=prior_factor.MarginalPrior.empty(F, dtype),
        lm_valid=jnp.asarray(lm_valid),
        fixed_cols=jnp.asarray(fixed))
    return SyntheticBA(gt_state, jnp.asarray(gt_inv_depth, dtype=dtype),
                       problem, seq)


def perturb_state(state: layout.WindowState, pos_sigma=0.05,
                  rot_sigma=0.02, vel_sigma=0.05, seed=0,
                  skip_first: bool = True):
    rng = np.random.default_rng(seed)
    F = state.num_frames
    dp = rng.normal(scale=pos_sigma, size=(F, 3))
    dth = rng.normal(scale=rot_sigma, size=(F, 3))
    dv = rng.normal(scale=vel_sigma, size=(F, 3))
    if skip_first:
        dp[0] = dth[0] = dv[0] = 0.0
    p, q = lie.pose_boxplus(state.p, state.q,
                            jnp.asarray(np.concatenate([dp, dth], -1)))
    return state._replace(p=p, q=q, v=state.v + jnp.asarray(dv))
