"""Marginalization: compress dropped window states into a linear prior.

Capability parity with `MarginalizationInfo::marginalize`
(`estimator/factor/marginalization_factor.cpp:191-320`): evaluate the
factors touching the dropped states at the current estimate, assemble
their Gauss-Newton system, Schur-complement the dropped dimensions
(eigendecomposition pseudo-inverse, eigenvalue floor 1e-8 like the
reference), and recover a square-root prior (J0, r0) via eigh.

The reference's pthread Hessian assembly + address-shift dance becomes:
one `build_normal_equations` call on the masked factor subset + static
column indexing + a column permutation at slide time.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from dynamic_vins_tpu.factors import prior as prior_factor
from dynamic_vins_tpu.solver import gauss_newton as gn
from dynamic_vins_tpu.solver import layout

_EIG_EPS = 1e-8

# Relative eigenvalue floor — an accuracy parameter, swept on the
# 42-frame noisy protocol (see _eig_threshold). Env override is for
# sweeps only.
import os as _os

_EIG_REL = float(_os.environ.get("DV_EIG_REL", "1e-6"))


def _eig_threshold(w):
    """Keep eigenvalues above max(abs_floor, rel_floor * max_eig).

    The reference uses an absolute 1e-8 floor (marginalization_factor.cpp);
    with IMU-bias information reaching ~1e12 a relative floor is needed so
    numerically-zero eigenvalues (≈ scale * eps) are not inverted.

    The rel floor is an ACCURACY parameter, not just a numerical guard:
    eigenvalues far below the (whitened, see _equilibrate) spectral
    norm carry gauge / weakly-observable directions whose linearization
    error outweighs their information — keeping them over-pins the
    prior. Round-4 sweep on the 42-frame noisy protocol (f32 CPU,
    3 frontend seeds, WITH equilibration): rel 1e-5 -> median 0.056,
    1e-6 -> 0.044, 1e-7 -> 0.060; equilibration itself cut the f32
    median 0.089 -> 0.044 (= f64's 0.049) and rescued a 0.149 outlier
    seed. Round-3 history (raw-spectrum floor): 1e-12 -> 1e-6 cut f64
    ATE 0.135 -> 0.03-0.05 (commit 9778711)."""
    w_max = jnp.maximum(jnp.max(jnp.abs(w)), _EIG_EPS)
    return jnp.maximum(_EIG_EPS, _EIG_REL * w_max)


def _equilibrate(A):
    """Jacobi scale s with (s A s) having unit-ish diagonal.

    The window Hessian's diagonal spans ~1e12 (IMU-bias vs visual
    information); an f32 eigh of the raw matrix has backward error
    ~||A||*eps, which is LARGER than the small eigenvalues — they come
    out as pure noise. Whitening by D^-1/2 compresses the dynamic range
    so eigh resolves the whole spectrum in f32; results are mapped back
    exactly (D is diagonal). In f64 this is a no-op accuracy-wise."""
    d = jnp.abs(jnp.diag(A))
    s = jnp.where(d > _EIG_EPS, 1.0 / jnp.sqrt(jnp.maximum(d, _EIG_EPS)),
                  1.0)
    return s


def _eig_pinv(A):
    """Symmetric pseudo-inverse with eigenvalue floor (marg_factor.cpp),
    computed on the Jacobi-equilibrated matrix for f32 robustness."""
    A = 0.5 * (A + A.T)
    s = _equilibrate(A)
    As = A * s[:, None] * s[None, :]
    w, V = jnp.linalg.eigh(As)
    thr = _eig_threshold(w)
    inv_w = jnp.where(w > thr, 1.0 / jnp.maximum(w, thr), 0.0)
    return (s[:, None] * V * inv_w[None, :]) @ (V.T * s[None, :])


def _schur_eliminate(H, b, drop_idx):
    """Eliminate the given (static) indices from (H, b); zero them out."""
    Hdd = H[jnp.ix_(drop_idx, drop_idx)]
    Hkd = H[:, drop_idx]                      # [D, d]
    bd = b[drop_idx]
    inv = _eig_pinv(Hdd)
    S = H - Hkd @ inv @ Hkd.T
    bk = b - Hkd @ (inv @ bd)
    S = S.at[drop_idx, :].set(0.0).at[:, drop_idx].set(0.0)
    bk = bk.at[drop_idx].set(0.0)
    return S, bk


def _sqrt_factorize(S, b):
    """(J0, r0) with J0ᵀJ0 = S and J0ᵀr0 = b, via eigh (marg ref :286-300).

    Computed on the Jacobi-equilibrated system: S = D^1/2 Ss D^1/2 with
    Ss = V w Vᵀ gives J0 = sqrt(w) Vᵀ D^1/2 (then J0ᵀJ0 = S exactly) —
    in f32 the raw eigh cannot resolve eigenvalues 1e12 below the
    spectral norm, and the prior is re-factorized EVERY frame, so the
    roundoff compounds over the sequence."""
    S = 0.5 * (S + S.T)
    s = _equilibrate(S)
    Ss = S * s[:, None] * s[None, :]
    w, V = jnp.linalg.eigh(Ss)
    thr = _eig_threshold(w)
    pos = w > thr
    sqrt_w = jnp.where(pos, jnp.sqrt(jnp.maximum(w, thr)), 0.0)
    inv_sqrt_w = jnp.where(pos, 1.0 / jnp.maximum(sqrt_w, _EIG_EPS), 0.0)
    J0 = sqrt_w[:, None] * (V.T / s[None, :])
    r0 = inv_sqrt_w * (V.T @ (s * b))
    return J0, r0


def _drop_indices_old(F: int):
    """Tangent dims of pose0 + speedbias0 (static)."""
    return jnp.concatenate([
        jnp.arange(6, dtype=jnp.int32) + layout.pose_col(0),
        jnp.arange(9, dtype=jnp.int32) + layout.speedbias_col(0, F)])


def marginalize_old(state: layout.WindowState, inv_depth,
                    problem: gn.BAProblem, drop_lm_mask,
                    config: gn.SolverConfig) -> prior_factor.MarginalPrior:
    """Marginalize frame 0 (+ its anchored landmarks) into a new prior.

    drop_lm_mask: [L] bool — landmark slots anchored at frame 0. The
    factor subset is: the existing prior, IMU edge 0, and all projection
    rows of dropped landmarks (they all touch pose 0 via their anchor,
    mirroring kMarginOld in `Estimator::SetMarginalizationInfo`).
    """
    F = state.num_frames
    sub_obs = problem.obs._replace(
        valid=problem.obs.valid & (problem.obs.frame_i == 0)
        & drop_lm_mask[problem.obs.lm])
    sub = problem._replace(
        obs=sub_obs,
        imu_valid=problem.imu_valid
        & (jnp.arange(problem.imu_valid.shape[0]) == 0),
        lm_valid=problem.lm_valid & drop_lm_mask)

    eq = gn.build_normal_equations(state, inv_depth, sub, config)

    # 1. eliminate the dropped landmarks (diagonal block)
    H_ll_safe = jnp.where(sub.lm_valid & (eq.H_ll > 0.0), eq.H_ll, 1.0)
    b_l = jnp.where(sub.lm_valid, eq.b_l, 0.0)
    H_lc = jnp.where(sub.lm_valid[:, None], eq.H_lc, 0.0)
    inv_Hll = 1.0 / H_ll_safe
    H1 = eq.H_cc - H_lc.T @ (H_lc * inv_Hll[:, None])
    b1 = eq.b_c - H_lc.T @ (b_l * inv_Hll)

    # 2. eliminate pose0 + speedbias0
    S, bk = _schur_eliminate(H1, b1, _drop_indices_old(F))

    J0, r0 = _sqrt_factorize(S, bk)
    # materialize the linearization point: a passthrough output would
    # alias the caller's (possibly host-mutated numpy) input buffer
    lin_state = jax.tree.map(lambda a: a + 0, state)
    return prior_factor.MarginalPrior(
        lin_state=lin_state, jacobian=J0, residual=r0,
        valid=jnp.ones((), bool))


def marginalize_second_new(prior: prior_factor.MarginalPrior,
                           num_frames: int) -> prior_factor.MarginalPrior:
    """Drop pose[F-2] from the existing prior (kMarginSecondNew).

    The reference asserts speedbias[F-2] never appears in the prior
    (estimator.cpp:554-617); here its columns are simply zero.
    """
    F = num_frames
    H = prior.jacobian.T @ prior.jacobian
    b = prior.jacobian.T @ prior.residual
    drop = jnp.arange(6, dtype=jnp.int32) + layout.pose_col(F - 2)
    S, bk = _schur_eliminate(H, b, drop)
    J0, r0 = _sqrt_factorize(S, bk)
    return prior._replace(jacobian=J0, residual=r0)


def _shift_perm_old(F: int):
    """Column gather indices: new tangent dim -> old tangent dim.

    After sliding out frame 0, new slot j holds old frame j+1
    (j = 0..F-2); slot F-1 is the incoming frame (zero prior columns,
    mapped to a dummy source that is zeroed via the mask)."""
    D = layout.cam_dim(F)
    src = jnp.arange(D, dtype=jnp.int32)
    keep = jnp.ones((D,), bool)
    for j in range(F - 1):
        src = src.at[layout.pose_col(j):layout.pose_col(j) + 6].set(
            jnp.int32(layout.pose_col(j + 1)) + jnp.arange(6, dtype=jnp.int32))
        src = src.at[layout.speedbias_col(j, F):
                     layout.speedbias_col(j, F) + 9].set(
            jnp.int32(layout.speedbias_col(j + 1, F)) + jnp.arange(9, dtype=jnp.int32))
    keep = keep.at[layout.pose_col(F - 1):layout.pose_col(F - 1) + 6].set(
        False)
    keep = keep.at[layout.speedbias_col(F - 1, F):
                   layout.speedbias_col(F - 1, F) + 9].set(False)
    return src, keep


def shift_prior_after_slide_old(prior: prior_factor.MarginalPrior,
                                slid_state: layout.WindowState
                                ) -> prior_factor.MarginalPrior:
    """Re-index prior columns after the window slid out frame 0.

    slid_state: the window state AFTER sliding — used as the new
    linearization point storage (the prior's dx is computed against the
    stored lin values per slot; slots the prior constrains hold exactly
    the old lin values shifted by one)."""
    F = slid_state.num_frames
    src, keep = _shift_perm_old(F)
    J_new = prior.jacobian[:, src] * keep[None, :].astype(
        prior.jacobian.dtype)
    # lin_state slots j <- old lin values j+1 (matching the column map)
    ls = prior.lin_state
    roll = lambda a: jnp.concatenate([a[1:], a[-1:]], axis=0)
    lin_new = ls._replace(p=roll(ls.p), q=roll(ls.q), v=roll(ls.v),
                          ba=roll(ls.ba), bg=roll(ls.bg))
    return prior_factor.MarginalPrior(lin_new, J_new, prior.residual,
                                      prior.valid)


def shift_prior_after_slide_new(prior: prior_factor.MarginalPrior
                                ) -> prior_factor.MarginalPrior:
    """After kMarginSecondNew slide (newest replaces second-newest).

    The prior's pose[F-2] columns were dropped and pose[F-1]/sb[F-1]
    columns are zero (new frames never enter the prior), so no column
    motion is needed; only the lin_state bookkeeping for slot F-2."""
    ls = prior.lin_state
    rep = lambda a: a.at[-2].set(a[-1])
    lin_new = ls._replace(p=rep(ls.p), q=rep(ls.q), v=rep(ls.v),
                          ba=rep(ls.ba), bg=rep(ls.bg))
    return prior._replace(lin_state=lin_new)
