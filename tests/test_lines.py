"""Line geometry, line factor, and line BA tests."""

import jax
import jax.numpy as jnp
import numpy as np

from dynamic_vins_tpu.factors.line_factor import LineObs
from dynamic_vins_tpu.geometry import lie, lines
from dynamic_vins_tpu.sim import ba_problems
from dynamic_vins_tpu.solver import gauss_newton as gn


def test_orth_plucker_roundtrip(rng):
    n = rng.normal(size=(32, 3))
    d = rng.normal(size=(32, 3))
    # make n ⟂ d (valid Plücker): n = p x d
    p = rng.normal(size=(32, 3))
    d = d / np.linalg.norm(d, axis=-1, keepdims=True)
    n = np.cross(p, d)
    orth = lines.plucker_to_orth(jnp.asarray(n), jnp.asarray(d))
    n2, d2 = lines.orth_to_plucker(orth)
    # same line up to scale: directions parallel, n/|n| matches
    n2, d2 = np.asarray(n2), np.asarray(d2)
    for i in range(32):
        nu = n[i] / np.linalg.norm(n[i])
        nu2 = n2[i] / np.linalg.norm(n2[i])
        du = d[i] / np.linalg.norm(d[i])
        du2 = d2[i] / np.linalg.norm(d2[i])
        np.testing.assert_allclose(nu2, nu, atol=1e-8)
        np.testing.assert_allclose(du2, du, atol=1e-8)
        # distance ratio |n|/|d| preserved
        r1 = np.linalg.norm(n[i]) / np.linalg.norm(d[i])
        r2 = np.linalg.norm(n2[i]) / np.linalg.norm(d2[i])
        np.testing.assert_allclose(r2, r1, rtol=1e-8)


def test_orth_boxplus_identity(rng):
    orth = jnp.asarray(rng.normal(size=(8, 4)))
    out = lines.orth_boxplus(orth, jnp.zeros((8, 4)))
    n1, d1 = lines.orth_to_plucker(orth)
    n2, d2 = lines.orth_to_plucker(out)
    np.testing.assert_allclose(np.asarray(n2), np.asarray(n1), atol=1e-9)


def _make_line_world(rng, num_lines, F=4):
    """World segments + observations from the synthetic trajectory."""
    from dynamic_vins_tpu.sim import synthetic as sim

    seq = sim.generate_sequence(num_frames=F, num_landmarks=4, seed=1)
    rig = seq.rig
    # segments floating in the viewing volume
    centers = sim.make_landmarks(num_lines, seed=7)
    dirs = rng.normal(size=(num_lines, 3))
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    s_w = np.asarray(centers) - dirs * 1.0
    e_w = np.asarray(centers) + dirs * 1.0

    obs_rows = []
    orth_gt = []
    valid_lines = []
    slot = 0
    for l in range(num_lines):
        n_w, d_w = lines.plucker_from_two_points(
            jnp.asarray(s_w[l]), jnp.asarray(e_w[l]))
        seen = []
        for k in range(F):
            p_wc, q_wc = lie.pose_compose(
                seq.gt_p[k], seq.gt_q[k], rig.p_bc, rig.q_bc)
            p_cw, q_cw = lie.pose_inverse(p_wc, q_wc)
            s_c = lie.pose_transform_point(p_cw, q_cw, jnp.asarray(s_w[l]))
            e_c = lie.pose_transform_point(p_cw, q_cw, jnp.asarray(e_w[l]))
            if float(s_c[2]) < 0.5 or float(e_c[2]) < 0.5:
                continue
            s_n = np.asarray(s_c / s_c[2])
            e_n = np.asarray(e_c / e_c[2])
            if abs(s_n[0]) > 0.8 or abs(s_n[1]) > 0.55:
                continue
            seen.append((k, s_n, e_n))
        if len(seen) >= 2:
            for k, s_n, e_n in seen:
                obs_rows.append((k, 0, slot, s_n, e_n))
            orth_gt.append(np.asarray(
                lines.plucker_to_orth(n_w, d_w)))
            valid_lines.append(True)
            slot += 1
    return seq, obs_rows, np.asarray(orth_gt), slot


def test_line_residual_zero_at_ground_truth(rng):
    seq, obs_rows, orth_gt, n_lines = _make_line_world(rng, 80)
    assert n_lines >= 10
    ba = ba_problems.build(num_frames=4, num_landmarks=40)
    Lc = 64
    obs = LineObs.empty(256)
    for i, (fj, cj, sl, s, e) in enumerate(obs_rows):
        obs = obs._replace(
            frame_j=obs.frame_j.at[i].set(fj),
            cam_j=obs.cam_j.at[i].set(cj),
            line=obs.line.at[i].set(sl),
            s=obs.s.at[i].set(s), e=obs.e.at[i].set(e),
            valid=obs.valid.at[i].set(True))
    orth = jnp.zeros((Lc, 4), jnp.float64)
    orth = orth.at[:n_lines].set(jnp.asarray(orth_gt))
    line_valid = jnp.arange(Lc) < n_lines

    from dynamic_vins_tpu.factors import line_factor
    r = line_factor.residual_only(ba.gt_state, orth, obs)
    assert float(jnp.max(jnp.abs(r))) < 1e-6


def test_line_ba_converges(rng):
    seq, obs_rows, orth_gt, n_lines = _make_line_world(rng, 80)
    ba = ba_problems.build(num_frames=4, num_landmarks=60)
    Lc = 64
    obs = LineObs.empty(256)
    for i, (fj, cj, sl, s, e) in enumerate(obs_rows):
        obs = obs._replace(
            frame_j=obs.frame_j.at[i].set(fj),
            cam_j=obs.cam_j.at[i].set(cj),
            line=obs.line.at[i].set(sl),
            s=obs.s.at[i].set(s), e=obs.e.at[i].set(e),
            valid=obs.valid.at[i].set(True))
    orth0 = jnp.zeros((Lc, 4), jnp.float64)
    orth0 = orth0.at[:n_lines].set(jnp.asarray(orth_gt))
    # perturb the lines
    orth0 = lines.orth_boxplus(
        orth0, jnp.asarray(rng.normal(scale=0.01, size=(Lc, 4))))
    line_valid = jnp.arange(Lc) < n_lines
    problem = ba.problem._replace(line_obs=obs, line_valid=line_valid)

    state0 = ba_problems.perturb_state(ba.gt_state, pos_sigma=0.03,
                                       rot_sigma=0.01, seed=3)
    cfg = gn.SolverConfig(use_imu=True, max_iters=12)
    st, dep, orth, info = gn.solve(state0, ba.gt_inv_depth, problem,
                                   cfg, line_orth=orth0)
    assert float(info.final_cost) < float(info.initial_cost) * 1e-2
    perr = np.max(np.linalg.norm(np.asarray(st.p - ba.gt_state.p), -1))
    assert perr < 5e-3, perr
    # line parameters recovered (compare via plucker direction)
    n_f, d_f = lines.orth_to_plucker(orth[:n_lines])
    n_g, d_g = lines.orth_to_plucker(jnp.asarray(orth_gt))
    cos = np.abs(np.sum(np.asarray(d_f) * np.asarray(d_g), -1)
                 / (np.linalg.norm(np.asarray(d_f), axis=-1)
                    * np.linalg.norm(np.asarray(d_g), axis=-1)))
    assert np.median(cos) > 0.9999


def test_line_triangulation_two_view(rng):
    seq, obs_rows, orth_gt, n_lines = _make_line_world(rng, 20)
    from dynamic_vins_tpu.sim import synthetic as sim
    rig = seq.rig
    # take the first line's first two observations
    rows0 = [r for r in obs_rows if r[2] == 0]
    (k0, _, _, s0, e0), (k1, _, _, s1, e1) = rows0[0], rows0[1]
    def cam_pose(k):
        p_wc, q_wc = lie.pose_compose(seq.gt_p[k], seq.gt_q[k],
                                      rig.p_bc, rig.q_bc)
        return lie.pose_inverse(p_wc, q_wc)
    p0, q0 = cam_pose(k0)
    p1, q1 = cam_pose(k1)
    n_w, d_w = lines.triangulate_line_two_view(
        p0, q0, p1, q1, jnp.asarray(s0), jnp.asarray(e0),
        jnp.asarray(s1), jnp.asarray(e1))
    orth_est = lines.plucker_to_orth(n_w, d_w)
    n_g, d_g = lines.orth_to_plucker(jnp.asarray(orth_gt[0]))
    cos = abs(float(jnp.sum(d_w * d_g))
              / (float(jnp.linalg.norm(d_w)) *
                 float(jnp.linalg.norm(d_g))))
    assert cos > 0.9999
    # distance ratio |n|/|d| matches
    r_est = float(jnp.linalg.norm(n_w) / jnp.linalg.norm(d_w))
    r_gt = float(jnp.linalg.norm(n_g) / jnp.linalg.norm(d_g))
    np.testing.assert_allclose(r_est, r_gt, rtol=1e-6)


def test_refine_orth_poses_fixed(rng):
    """Line-only pre-optimization (OptimizationWithOnlyLine parity):
    perturbed lines must snap back to ground truth with poses fixed."""
    from dynamic_vins_tpu.factors import line_factor

    seq, obs_rows, orth_gt, n_lines = _make_line_world(rng, 80)
    ba = ba_problems.build(num_frames=4, num_landmarks=40)
    Lc = 64
    obs = LineObs.empty(256)
    for i, (fj, cj, sl, s, e) in enumerate(obs_rows):
        obs = obs._replace(
            frame_j=obs.frame_j.at[i].set(fj),
            cam_j=obs.cam_j.at[i].set(cj),
            line=obs.line.at[i].set(sl),
            s=obs.s.at[i].set(s), e=obs.e.at[i].set(e),
            valid=obs.valid.at[i].set(True))
    orth_true = jnp.zeros((Lc, 4), jnp.float64)
    orth_true = orth_true.at[:n_lines].set(jnp.asarray(orth_gt))
    orth0 = lines.orth_boxplus(
        orth_true, jnp.asarray(rng.normal(scale=0.02, size=(Lc, 4))))
    line_valid = jnp.arange(Lc) < n_lines

    r0 = line_factor.residual_only(ba.gt_state, orth0, obs)
    orth = line_factor.refine_orth(ba.gt_state, orth0, obs, line_valid,
                                   iters=8)
    r1 = line_factor.residual_only(ba.gt_state, orth, obs)
    m0 = float(jnp.mean(jnp.abs(r0)))
    m1 = float(jnp.mean(jnp.abs(r1)))
    assert m1 < m0 * 1e-2, (m0, m1)
    # invalid slots pass through untouched
    np.testing.assert_allclose(np.asarray(orth[n_lines:]),
                               np.asarray(orth0[n_lines:]))


def test_line_weight_scales_line_cost(rng):
    """SolverConfig.line_weight scales line residuals (and only them):
    measured trade-off on the synthetic e2e protocols (round 2 sweep) —
    point-rich (120 lm): w=1.0 ATE 5.7cm -> w=0.2 4.7cm;
    point-poor (25 lm): w=1.0 2.9cm -> w=0.2 4.5cm. Default stays 1.0
    (reference parity; lines matter most point-poor)."""
    seq, obs_rows, orth_gt, n_lines = _make_line_world(rng, 40)
    ba = ba_problems.build(num_frames=4, num_landmarks=40)
    Lc = 64
    obs = LineObs.empty(256)
    for i, (fj, cj, sl, s, e) in enumerate(obs_rows):
        obs = obs._replace(
            frame_j=obs.frame_j.at[i].set(fj),
            cam_j=obs.cam_j.at[i].set(cj),
            line=obs.line.at[i].set(sl),
            s=obs.s.at[i].set(s), e=obs.e.at[i].set(e),
            valid=obs.valid.at[i].set(True))
    orth = jnp.zeros((Lc, 4), jnp.float64)
    orth = orth.at[:n_lines].set(jnp.asarray(orth_gt))
    # tiny perturbation: stay inside the Huber quadratic region so the
    # line cost scales exactly with line_weight^2
    orth = lines.orth_boxplus(
        orth, jnp.asarray(rng.normal(scale=1e-5, size=(Lc, 4))))
    line_valid = jnp.arange(Lc) < n_lines
    problem = ba.problem._replace(line_obs=obs, line_valid=line_valid)

    def line_cost(w):
        cfg = gn.SolverConfig(use_imu=True, line_weight=w)
        full = gn.total_cost(ba.gt_state, ba.gt_inv_depth, problem, cfg,
                             line_orth=orth)
        base = gn.total_cost(ba.gt_state, ba.gt_inv_depth,
                             problem._replace(line_obs=None), cfg)
        return float(full - base)

    c1, c05 = line_cost(1.0), line_cost(0.5)
    assert c1 > 0
    np.testing.assert_allclose(c05, 0.25 * c1, rtol=1e-6)
