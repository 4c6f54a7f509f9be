"""Simulated frontend: turns a SyntheticSequence into estimator inputs.

Plays the role of the reference's feature-serialization replay
(`utils/io/feature_serialization.h`, main.cpp:287-295): a deterministic,
frontend-free source of per-frame features for backend testing.
"""

from __future__ import annotations

import numpy as np

from dynamic_vins_tpu.estimator.estimator import FrameFeatures
from dynamic_vins_tpu.sim import synthetic as sim


def make_frames(seq: sim.SyntheticSequence, max_feats: int = 150,
                pixel_noise: float = 0.0, stereo: bool = True, seed=0):
    """Yield (FrameFeatures, imu_interval) per frame.

    imu_interval = (acc [M+1,3], gyr [M+1,3], dt [M]) covering the time
    since the previous frame (None for the first frame — except the
    estimator wants a gravity sample, so frame 0 gets a 1-sample interval).
    """
    rng = np.random.default_rng(seed)
    F = seq.frame_times.shape[0]
    imu_per_frame = round(float(
        (seq.imu_times.shape[0] - 1) / (F - 1)))

    uv_l, vis_l, ptc_l = sim.observe(seq.rig, seq.gt_p, seq.gt_q,
                                     seq.landmarks, cam=0)
    uv_r, vis_r, ptc_r = sim.observe(seq.rig, seq.gt_p, seq.gt_q,
                                     seq.landmarks, cam=1)
    vis_l = np.asarray(vis_l)
    vis_r = np.asarray(vis_r)
    ptc_l = np.asarray(ptc_l)
    ptc_r = np.asarray(ptc_r)
    acc_np = np.asarray(seq.acc)
    gyr_np = np.asarray(seq.gyr)
    t_np = np.asarray(seq.imu_times)

    def norm_pt(ptc, noisy):
        xy = ptc[:2] / ptc[2]
        if pixel_noise > 0 and noisy:
            xy = xy + rng.normal(scale=pixel_noise / 460.0, size=2)
        return np.array([xy[0], xy[1], 1.0])

    out = []
    for k in range(F):
        feats = {}
        ids = np.flatnonzero(vis_l[k])
        if ids.size > max_feats:
            ids = ids[:max_feats]
        for l in ids:
            pl = norm_pt(ptc_l[k, l], True)
            if stereo and vis_r[k, l]:
                pr = norm_pt(ptc_r[k, l], True)
                feats[int(l)] = (pl, np.zeros(3), pr, np.zeros(3))
            else:
                feats[int(l)] = (pl, np.zeros(3), None, None)
        if k == 0:
            a, b = 0, 1
        else:
            a, b = (k - 1) * imu_per_frame, k * imu_per_frame
        imu = (acc_np[a:b + 1], gyr_np[a:b + 1], np.diff(t_np[a:b + 1]))
        out.append((FrameFeatures(float(seq.frame_times[k]), feats), imu))
    return out


def make_line_segments(num: int = 40, seed: int = 9):
    """World line segments scattered around the trajectory volume."""
    rng = np.random.default_rng(seed)
    centers = np.asarray(sim.make_landmarks(num, seed=seed))
    dirs = rng.normal(size=(num, 3))
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    return centers - dirs, centers + dirs


def line_obs_for_frame(seq, k, s_w, e_w, rng, noise: float = 0.3):
    """Project world segments (s_w, e_w [L,3]) into frame k's left+right
    cameras -> {line_id: (s_l, e_l, s_r|None, e_r|None)} normalized
    endpoints (the estimator's line-obs format)."""
    import jax.numpy as jnp

    from dynamic_vins_tpu.geometry import lie

    rig = seq.rig
    extr = [(rig.p_bc, rig.q_bc), rig.right_extrinsics()]
    out = {}
    for l in range(len(s_w)):
        obs = []
        for c in range(2):
            p_wc, q_wc = lie.pose_compose(seq.gt_p[k], seq.gt_q[k],
                                          extr[c][0], extr[c][1])
            p_cw, q_cw = lie.pose_inverse(p_wc, q_wc)
            sc = np.asarray(lie.pose_transform_point(
                p_cw, q_cw, jnp.asarray(s_w[l])))
            ec = np.asarray(lie.pose_transform_point(
                p_cw, q_cw, jnp.asarray(e_w[l])))
            if sc[2] < 0.5 or ec[2] < 0.5:
                obs.append(None)
                continue
            sn = sc[:2] / sc[2] + rng.normal(scale=noise / 460, size=2)
            en = ec[:2] / ec[2] + rng.normal(scale=noise / 460, size=2)
            if np.abs(sn).max() > 0.9:
                obs.append(None)
                continue
            obs.append((np.append(sn, 1.0), np.append(en, 1.0)))
        if obs[0] is not None:
            sr, er = (obs[1] if obs[1] is not None else (None, None))
            out[l] = (obs[0][0], obs[0][1], sr, er)
    return out


def ate_rmse(est_p, gt_p):
    """Absolute trajectory error RMSE after SE(3)-free direct diff
    (trajectories share the same origin by construction)."""
    d = np.asarray(est_p) - np.asarray(gt_p)
    return float(np.sqrt(np.mean(np.sum(d * d, axis=-1))))
