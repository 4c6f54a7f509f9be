"""Marginalization prior factor.

Capability parity with `MarginalizationFactor::Evaluate`
(`estimator/factor/marginalization_factor.cpp`): a first-order prior
r(x) = r0 + J0 * (x ⊟ x0) with constant Jacobian J0, produced by the
Schur complement of the dropped states (see solver/marginalization.py).

The Jacobian spans the full camera-side tangent space (columns for
states the prior does not constrain are zero), so assembly needs no
index bookkeeping — the address-shift dance of the reference
(estimator.cpp:536-616) becomes a column permutation at slide time.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from dynamic_vins_tpu.solver import layout
from dynamic_vins_tpu.utils import precision


class MarginalPrior(NamedTuple):
    lin_state: layout.WindowState   # linearization point x0
    jacobian: jnp.ndarray           # [R, Dc]
    residual: jnp.ndarray           # [R]
    valid: jnp.ndarray              # [] bool — whether a prior exists

    @classmethod
    def empty(cls, num_frames: int = layout.NUM_FRAMES, dtype=None):
        dtype = dtype or precision.default_float()
        D = layout.cam_dim(num_frames)
        return cls(layout.WindowState.identity(num_frames, dtype),
                   jnp.zeros((D, D), dtype), jnp.zeros((D,), dtype),
                   jnp.zeros((), bool))


def evaluate(state: layout.WindowState, prior: MarginalPrior):
    """Residual [R] and (constant) Jacobian [R, Dc]."""
    dx = state.boxminus(prior.lin_state)
    r = prior.residual + prior.jacobian @ dx
    r = jnp.where(prior.valid, r, 0.0)
    J = jnp.where(prior.valid, prior.jacobian, 0.0)
    return r, J


def residual_only(state: layout.WindowState, prior: MarginalPrior):
    dx = state.boxminus(prior.lin_state)
    r = prior.residual + prior.jacobian @ dx
    return jnp.where(prior.valid, r, 0.0)
