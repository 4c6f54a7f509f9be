"""Matmul-precision control for the solver path.

On TPU, float32 matmuls default to fast bfloat16-input passes. That is
fine for the perception nets but costs real accuracy in the estimator:
the synthetic 30-frame protocol degrades from 4.2 cm to 8.1 cm ATE at
default precision (Hessian assembly / Schur products lose the low
mantissa bits). `precise_jit` is a drop-in `jax.jit` replacement that
traces its body under `jax.default_matmul_precision("float32")`
(3-pass f32 emulation, ~+8% on the 125 ms frame).
"""

from __future__ import annotations

import functools

import jax


def default_float():
    """float64 under x64, float32 otherwise (no truncation warning)."""
    return jax.dtypes.canonicalize_dtype(jax.numpy.float64)


def precise(fn):
    """Trace `fn` under float32 matmul precision."""

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("float32"):
            return fn(*args, **kwargs)

    return wrapped


def precise_jit(fn=None, **jit_kwargs):
    """`jax.jit` with float32 matmul precision baked into the trace."""
    if fn is None:
        return lambda f: precise_jit(f, **jit_kwargs)
    return jax.jit(precise(fn), **jit_kwargs)
