"""Pallas TPU kernel for one pyramid level of iterative Lucas-Kanade.

The XLA implementation (frontend/lk.py) gathers 21x21 patches with
`bilinear_sample` — every patch pixel is an independent 4-point gather.
This kernel instead DMAs one [WIN_H, WIN_W] window per feature from HBM
into VMEM and evaluates the LK iterations entirely on-chip, exploiting
the fact that all pixels of a patch share one fractional offset: a
bilinearly-sampled patch is a weighted sum of four *contiguous integer
slices* of the window — pure dynamic slices, no gather.

Grid: one program per feature. Per program: 2 async DMAs (img0, img1
windows), in-VMEM Scharr gradients, `iters` fixed LK iterations.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

WIN_H = 48          # window rows (multiple of the 8-row sublane tile)
WIN_W = 256         # window cols (multiple of the 128 lane width; wide
                    # enough that lane-snapped origins keep >=64 px of
                    # drift margin around any feature)


def _bilinear_patch(win_ref, ly, lx, P):
    """Patch [P,P] from the VMEM window at float top-left coords.

    Mosaic cannot dynamically slice the lane dimension, so the bilinear
    sample is expressed as TWO MATMULS with banded one-hot selector
    matrices (rows fold in the y shift + y fraction, cols the x shift +
    x fraction): patch = R[P,WIN_H] @ win @ C[WIN_W,P]. Runs on the MXU.
    """
    win = win_ref[:]
    dtype = win.dtype
    iy = jnp.floor(ly)
    ix = jnp.floor(lx)
    fy = (ly - iy).astype(dtype)
    fx = (lx - ix).astype(dtype)
    iy = iy.astype(jnp.int32)
    ix = ix.astype(jnp.int32)

    rows = jax.lax.broadcasted_iota(jnp.int32, (P, WIN_H), 1)
    ridx = jax.lax.broadcasted_iota(jnp.int32, (P, WIN_H), 0)
    R = (jnp.where(rows == iy + ridx, 1.0 - fy, 0.0)
         + jnp.where(rows == iy + 1 + ridx, fy, 0.0)).astype(dtype)

    cols = jax.lax.broadcasted_iota(jnp.int32, (WIN_W, P), 0)
    cidx = jax.lax.broadcasted_iota(jnp.int32, (WIN_W, P), 1)
    C = (jnp.where(cols == ix + cidx, 1.0 - fx, 0.0)
         + jnp.where(cols == ix + 1 + cidx, fx, 0.0)).astype(dtype)

    return jnp.dot(jnp.dot(R, win, preferred_element_type=dtype), C,
                   preferred_element_type=dtype)


def _make_kernel(radius: int, iters: int, H: int, W: int):
    P = 2 * radius + 1

    def kernel(meta_ref, pts_sref, guess_sref, img0_hbm, img1_hbm,
               out_ref, ok_ref, w0, w1, sem0, sem1):
        i = pl.program_id(0)
        # origins are pre-snapped to (8, 128) multiples by the wrapper;
        # the hints let Mosaic prove DMA tile alignment
        oy0 = pl.multiple_of(meta_ref[i, 0], 8)
        ox0 = pl.multiple_of(meta_ref[i, 1], 128)
        oy1 = pl.multiple_of(meta_ref[i, 2], 8)
        ox1 = pl.multiple_of(meta_ref[i, 3], 128)

        cp0 = pltpu.make_async_copy(
            img0_hbm.at[pl.ds(oy0, WIN_H), pl.ds(ox0, WIN_W)], w0, sem0)
        cp1 = pltpu.make_async_copy(
            img1_hbm.at[pl.ds(oy1, WIN_H), pl.ds(ox1, WIN_W)], w1, sem1)
        cp0.start()
        cp1.start()
        cp0.wait()
        cp1.wait()

        # feature position local to window 0 (float)
        x = pts_sref[i, 0]
        y = pts_sref[i, 1]
        lx0 = x - ox0.astype(x.dtype)
        ly0 = y - oy0.astype(y.dtype)

        # template patch + central-difference gradient patches (all via
        # slice-based bilinear sampling of the VMEM window)
        tl_y = ly0 - radius
        tl_x = lx0 - radius
        patch0 = _bilinear_patch(w0, tl_y, tl_x, P)
        gpx = 0.5 * (_bilinear_patch(w0, tl_y, tl_x + 1.0, P)
                     - _bilinear_patch(w0, tl_y, tl_x - 1.0, P))
        gpy = 0.5 * (_bilinear_patch(w0, tl_y + 1.0, tl_x, P)
                     - _bilinear_patch(w0, tl_y - 1.0, tl_x, P))

        a11 = jnp.sum(gpx * gpx)
        a12 = jnp.sum(gpx * gpy)
        a22 = jnp.sum(gpy * gpy)
        det = a11 * a22 - a12 * a12
        good = det > 1e-6
        inv_det = jnp.where(good, 1.0 / jnp.maximum(det, 1e-6), 0.0)

        # local position of the feature in window 1 at guess g
        gx0 = guess_sref[i, 0]
        gy0 = guess_sref[i, 1]

        def body(_, g):
            gu, gv = g
            l1y = y + gv - oy1.astype(y.dtype) - radius
            l1x = x + gu - ox1.astype(x.dtype) - radius
            # clamp inside window (keeps pl.ds in range)
            l1y = jnp.clip(l1y, 0.0, WIN_H - P - 2.0)
            l1x = jnp.clip(l1x, 0.0, WIN_W - P - 2.0)
            patch1 = _bilinear_patch(w1, l1y, l1x, P)
            diff = patch1 - patch0
            b1 = jnp.sum(diff * gpx)
            b2 = jnp.sum(diff * gpy)
            du = -(a22 * b1 - a12 * b2) * inv_det
            dv = -(-a12 * b1 + a11 * b2) * inv_det
            return (gu + du, gv + dv)

        gu, gv = jax.lax.fori_loop(0, iters, body, (gx0, gy0))
        out_ref[i, 0] = gu
        out_ref[i, 1] = gv
        ok_ref[i, 0] = good.astype(jnp.int32)

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("radius", "iters", "interpret"))
def lk_level(img0, img1, pts, guess, radius: int = 10, iters: int = 10,
             interpret: bool = False):
    """One LK pyramid level for all points via the Pallas kernel.

    img0/img1: [H,W] float32; pts: [N,2] (x,y) positions in img0;
    guess: [N,2] current flow. Returns (flow [N,2], ok [N]).
    Drop-in for frontend.lk._lk_level (same math, windowed)."""
    N = pts.shape[0]
    P = 2 * radius + 1

    # pad images to window-tile multiples so snapped windows always fit
    H0, W0 = img0.shape
    H = max((H0 + 7) // 8 * 8, WIN_H)
    W = max((W0 + 127) // 128 * 128, WIN_W)
    if (H, W) != (H0, W0):
        img0 = jnp.pad(img0, ((0, H - H0), (0, W - W0)), mode="edge")
        img1 = jnp.pad(img1, ((0, H - H0), (0, W - W0)), mode="edge")

    # window origins snapped to the (8, 128) DMA tiling, clamped in-image
    def snap(cy, cx):
        oy = jnp.clip((jnp.floor((cy - WIN_H / 2) / 8.0)
                       ).astype(jnp.int32) * 8, 0, H - WIN_H)
        ox = jnp.clip((jnp.floor(cx / 128.0 - 0.5)
                       ).astype(jnp.int32) * 128, 0, W - WIN_W)
        return oy, ox

    cy = pts[:, 1]
    cx = pts[:, 0]
    oy0, ox0 = snap(cy, cx)
    oy1, ox1 = snap(cy + guess[:, 1], cx + guess[:, 0])
    meta = jnp.stack([oy0, ox0, oy1, ox1], axis=1)

    kernel = _make_kernel(radius, iters, H, W)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,      # meta, pts, guess (SMEM scalars)
        grid=(N,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),   # img0 (HBM)
            pl.BlockSpec(memory_space=pltpu.ANY),   # img1 (HBM)
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # flow [N,2]
            pl.BlockSpec(memory_space=pltpu.SMEM),  # ok [N,1]
        ],
        scratch_shapes=[
            pltpu.VMEM((WIN_H, WIN_W), img0.dtype),
            pltpu.VMEM((WIN_H, WIN_W), img0.dtype),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    flow, ok = pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((N, 2), img0.dtype),
            jax.ShapeDtypeStruct((N, 1), jnp.int32),
        ],
        grid_spec=grid_spec,
        interpret=interpret,
    )(meta, pts, guess, img0, img1)
    return flow, ok[:, 0] > 0
