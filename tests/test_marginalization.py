import jax
import jax.numpy as jnp
import numpy as np

from dynamic_vins_tpu.factors import prior as prior_factor
from dynamic_vins_tpu.sim import ba_problems
from dynamic_vins_tpu.solver import gauss_newton as gn
from dynamic_vins_tpu.solver import layout, marginalization as marg


def _drop_lm_mask(problem):
    """Landmarks anchored at frame 0."""
    L = problem.lm_valid.shape[0]
    anchored0 = np.zeros(L, bool)
    fi = np.asarray(problem.obs.frame_i)
    lm = np.asarray(problem.obs.lm)
    valid = np.asarray(problem.obs.valid)
    anchored0[lm[valid & (fi == 0)]] = True
    return jnp.asarray(anchored0)


def test_marginalize_old_matches_numpy_oracle():
    ba = ba_problems.build(num_frames=5, num_landmarks=60)
    cfg = gn.SolverConfig(use_imu=True)
    F = 5
    drop_lm = _drop_lm_mask(ba.problem)
    prior = marg.marginalize_old(ba.gt_state, ba.gt_inv_depth,
                                 ba.problem, drop_lm, cfg)
    # oracle: same subset system eliminated with numpy
    sub_obs = ba.problem.obs._replace(
        valid=ba.problem.obs.valid & (ba.problem.obs.frame_i == 0)
        & drop_lm[ba.problem.obs.lm])
    sub = ba.problem._replace(
        obs=sub_obs,
        imu_valid=ba.problem.imu_valid
        & (jnp.arange(4) == 0),
        lm_valid=ba.problem.lm_valid & drop_lm)
    eq = gn.build_normal_equations(ba.gt_state, ba.gt_inv_depth, sub, cfg)
    H_cc = np.asarray(eq.H_cc)
    b_c = np.asarray(eq.b_c)
    H_ll = np.asarray(eq.H_ll)
    H_lc = np.asarray(eq.H_lc)
    b_l = np.asarray(eq.b_l)
    lmv = np.asarray(sub.lm_valid)
    Hs = np.where(lmv & (H_ll > 0), H_ll, 1.0)
    H1 = H_cc - (H_lc * (lmv / Hs)[:, None]).T @ H_lc
    b1 = b_c - H_lc.T @ (lmv * b_l / Hs)
    drop = np.concatenate([np.arange(6),
                           layout.speedbias_col(0, F) + np.arange(9)])
    keep = np.setdiff1d(np.arange(layout.cam_dim(F)), drop)
    Hdd = H1[np.ix_(drop, drop)]
    S = (H1[np.ix_(keep, keep)]
         - H1[np.ix_(keep, drop)] @ np.linalg.pinv(Hdd)
         @ H1[np.ix_(drop, keep)])
    J0 = np.asarray(prior.jacobian)
    S_prior = (J0.T @ J0)[np.ix_(keep, keep)]
    # the eigenvalue floor acts on the Jacobi-equilibrated spectrum
    # (marginalization._sqrt_factorize — the f32 robustness fix), so
    # the reconstruction is exact up to the floor in the WHITENED
    # metric; compare there (the raw-scale error of a dropped whitened
    # direction scales with the diagonal, by design)
    d = np.abs(np.diag(S))
    s = np.where(d > 1e-8, 1.0 / np.sqrt(np.maximum(d, 1e-8)), 1.0)
    Sw = S * s[:, None] * s[None, :]
    dw = np.abs(S_prior - S) * s[:, None] * s[None, :]
    assert dw.max() < 2e-5 * np.linalg.norm(Sw, 2), dw.max()
    # gradient consistency
    b_prior = (J0.T @ np.asarray(prior.residual))[keep]
    b_oracle = (b1[keep] - H1[np.ix_(keep, drop)]
                @ np.linalg.pinv(Hdd) @ b1[drop])
    b_scale = max(np.linalg.norm(b_oracle), 1.0)
    assert np.abs((b_prior - b_oracle) * s).max() < 1e-5 * b_scale
    # dropped columns are exactly zero
    assert np.allclose(J0[:, drop], 0.0)


def test_prior_quadratic_behavior():
    """Prior cost approximates the eliminated system's quadratic form."""
    ba = ba_problems.build(num_frames=5, num_landmarks=60)
    cfg = gn.SolverConfig(use_imu=True)
    drop_lm = _drop_lm_mask(ba.problem)
    prior = marg.marginalize_old(ba.gt_state, ba.gt_inv_depth,
                                 ba.problem, drop_lm, cfg)
    r0, J0 = prior_factor.evaluate(ba.gt_state, prior)
    # at the linearization point, residual == r0
    np.testing.assert_allclose(np.asarray(r0),
                               np.asarray(prior.residual), atol=1e-12)
    # perturb a kept state: cost increases quadratically
    st2 = ba_problems.perturb_state(ba.gt_state, pos_sigma=0.01,
                                    rot_sigma=0.005, seed=2)
    r2 = prior_factor.residual_only(st2, prior)
    dx = st2.boxminus(ba.gt_state)
    expected = np.asarray(prior.residual) + np.asarray(
        prior.jacobian) @ np.asarray(dx)
    np.testing.assert_allclose(np.asarray(r2), expected, atol=1e-12)


def test_shift_prior_old_invariance(rng):
    """Shifted prior on slid state == original prior on original state."""
    F = 5
    D = layout.cam_dim(F)
    ba = ba_problems.build(num_frames=F, num_landmarks=60)
    cfg = gn.SolverConfig(use_imu=True)
    drop_lm = _drop_lm_mask(ba.problem)
    prior = marg.marginalize_old(ba.gt_state, ba.gt_inv_depth,
                                 ba.problem, drop_lm, cfg)

    # a "current" state differing from lin point
    cur = ba_problems.perturb_state(ba.gt_state, pos_sigma=0.02,
                                    rot_sigma=0.01, seed=9,
                                    skip_first=False)
    r_before = prior_factor.residual_only(cur, prior)

    # slide: slot j <- frame j+1; last slot gets a brand-new frame
    roll = lambda a: jnp.concatenate([a[1:], a[-1:]], axis=0)
    slid = cur._replace(p=roll(cur.p), q=roll(cur.q), v=roll(cur.v),
                        ba=roll(cur.ba), bg=roll(cur.bg))
    # overwrite the incoming slot with arbitrary junk — must not matter
    slid = slid._replace(p=slid.p.at[-1].add(123.0))
    prior_shifted = marg.shift_prior_after_slide_old(prior, slid)
    r_after = prior_factor.residual_only(slid, prior_shifted)
    np.testing.assert_allclose(np.asarray(r_after), np.asarray(r_before),
                               atol=1e-10)


def test_marginalize_second_new_drops_pose():
    F = 5
    ba = ba_problems.build(num_frames=F, num_landmarks=60)
    cfg = gn.SolverConfig(use_imu=True)
    drop_lm = _drop_lm_mask(ba.problem)
    prior = marg.marginalize_old(ba.gt_state, ba.gt_inv_depth,
                                 ba.problem, drop_lm, cfg)
    prior2 = marg.marginalize_second_new(prior, F)
    J = np.asarray(prior2.jacobian)
    c = layout.pose_col(F - 2)
    # dropped columns vanish up to eigh reconstruction noise (scales
    # with the spectral norm of the prior)
    assert np.abs(J[:, c:c + 6]).max() < 1e-9 * np.abs(J).max()
    # information in other blocks shrinks or stays (PSD ordering)
    H1 = np.asarray(prior.jacobian).T @ np.asarray(prior.jacobian)
    H2 = J.T @ J
    keep = np.setdiff1d(np.arange(layout.cam_dim(F)),
                        np.arange(c, c + 6))
    diff = H1[np.ix_(keep, keep)] - H2[np.ix_(keep, keep)]
    eig = np.linalg.eigvalsh(0.5 * (diff + diff.T))
    assert eig.min() > -1e-6
