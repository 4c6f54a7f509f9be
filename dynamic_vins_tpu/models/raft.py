"""RAFT-style recurrent optical flow, TPU-native.

Capability parity with the reference's dense-flow stage
(`flow/raft.{h,cpp}`: three TensorRT engines — fnet, cnet, iterated
update — driven by `FlowEstimator::Launch` `flow_estimator.cpp:33`;
disabled by default in the reference's main path, `cfg::use_dense_flow`
off). Provided here as a first-class online stage.

Architecture (RAFT's shape):
  fnet: shared feature encoder at 1/8 -> left/right features,
  cnet: context encoder at 1/8 -> (hidden state, context),
  all-pairs correlation volume [h*w, h*w] (ONE matmul — the part of
  RAFT that is practically built for the MXU),
  iterative ConvGRU update with correlation lookups, run under
  `lax.scan` with a static iteration count,
  x8 bilinear upsample of the final flow.

The correlation LOOKUP (a windowed gather around the current flow
target) is expressed as `jax.image`-free bilinear sampling with
static window offsets, vmapped over pixels — XLA fuses it into a few
gathers; the O(N^2) volume itself stays resident in HBM.
"""

from __future__ import annotations

from typing import NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from dynamic_vins_tpu.models import layers


class Encoder(nn.Module):
    """1/8-resolution conv encoder (fnet/cnet role)."""

    out_dim: int = 96
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = layers.ConvGN(32, 7, 2, dtype=self.dtype)(x)     # /2
        x = layers.BasicBlock(32, dtype=self.dtype)(x)
        x = layers.BasicBlock(48, 2, dtype=self.dtype)(x)    # /4
        x = layers.BasicBlock(64, 2, dtype=self.dtype)(x)    # /8
        return nn.Conv(self.out_dim, (1, 1), dtype=self.dtype)(x)


def all_pairs_correlation(f1, f2):
    """[h,w,c] x [h,w,c] -> [h*w, h, w] correlation volume (matmul)."""
    h, w, c = f1.shape
    a = f1.reshape(h * w, c).astype(jnp.float32)
    b = f2.reshape(h * w, c).astype(jnp.float32)
    return (a @ b.T / np.sqrt(c)).reshape(h * w, h, w)


def lookup(corr, coords, radius: int = 3):
    """Sample the correlation volume in a (2r+1)^2 window around
    per-pixel target coords.

    corr: [N, h, w]; coords: [N, 2] (x, y). Returns [N, (2r+1)^2].
    """
    n, h, w = corr.shape
    offs = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    dx, dy = jnp.meshgrid(offs, offs, indexing="xy")
    dx, dy = dx.reshape(-1), dy.reshape(-1)                  # [K]
    x = coords[:, 0:1] + dx[None]                            # [N,K]
    y = coords[:, 1:2] + dy[None]
    x0 = jnp.clip(jnp.floor(x), 0, w - 2)
    y0 = jnp.clip(jnp.floor(y), 0, h - 2)
    ax = jnp.clip(x - x0, 0.0, 1.0)
    ay = jnp.clip(y - y0, 0.0, 1.0)
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    flat = corr.reshape(n, h * w)
    rows = jnp.arange(n)[:, None]
    idx00 = y0i * w + x0i
    v00 = flat[rows, idx00]
    v01 = flat[rows, idx00 + 1]
    v10 = flat[rows, idx00 + w]
    v11 = flat[rows, idx00 + w + 1]
    return (v00 * (1 - ax) * (1 - ay) + v01 * ax * (1 - ay)
            + v10 * (1 - ax) * ay + v11 * ax * ay)


class ConvGRU(nn.Module):
    hidden: int = 64
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, h, x):
        hx = jnp.concatenate([h, x], -1)
        conv = lambda name: nn.Conv(self.hidden, (3, 3), padding="SAME",
                                    dtype=self.dtype, name=name)
        z = jax.nn.sigmoid(conv("z")(hx))
        r = jax.nn.sigmoid(conv("r")(hx))
        q = jnp.tanh(conv("q")(jnp.concatenate([r * h, x], -1)))
        return (1 - z) * h + z * q


class UpdateBlock(nn.Module):
    hidden: int = 64
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, h, ctx, corr_feat, flow):
        mot = nn.relu(nn.Conv(48, (3, 3), padding="SAME",
                              dtype=self.dtype, name="enc_corr")(
            jnp.concatenate([corr_feat, flow], -1)))
        inp = jnp.concatenate([ctx, mot], -1)
        h = ConvGRU(self.hidden, dtype=self.dtype)(h, inp)
        dflow = nn.Conv(2, (3, 3), padding="SAME", dtype=self.dtype,
                        name="flow_head")(nn.relu(
            nn.Conv(64, (3, 3), padding="SAME", dtype=self.dtype,
                    name="flow_mid")(h)))
        return h, dflow


class RAFT(nn.Module):
    iters: int = 8
    radius: int = 3
    hidden: int = 64
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, img1, img2):
        fnet = Encoder(96, dtype=self.dtype, name="fnet")
        cnet = Encoder(self.hidden * 2, dtype=self.dtype, name="cnet")
        f1, f2 = fnet(img1)[0], fnet(img2)[0]                # [h,w,c]
        ctx_all = cnet(img1)[0]
        h0 = jnp.tanh(ctx_all[..., :self.hidden])
        ctx = nn.relu(ctx_all[..., self.hidden:])
        hgt, wid, _ = f1.shape
        corr = all_pairs_correlation(f1, f2)                 # [N,h,w]

        xs = jnp.arange(wid, dtype=jnp.float32)
        ys = jnp.arange(hgt, dtype=jnp.float32)
        xx, yy = jnp.meshgrid(xs, ys, indexing="xy")
        base = jnp.stack([xx, yy], -1).reshape(-1, 2)        # [N,2]

        update = UpdateBlock(self.hidden, dtype=self.dtype)
        k = (2 * self.radius + 1) ** 2

        flow = jnp.zeros((hgt, wid, 2), jnp.float32)
        h = h0
        for _ in range(self.iters):     # static unroll; shared params
            coords = base + flow.reshape(-1, 2)
            cf = lookup(corr, coords, self.radius).reshape(hgt, wid, k)
            h, dflow = update(h, ctx, cf, flow)
            flow = flow + dflow.astype(jnp.float32)

        up = jax.image.resize(flow, (img1.shape[1], img1.shape[2], 2),
                              "bilinear") * 8.0
        return up


class OnlineFlowEstimator:
    """Online dense flow stage (FlowEstimator::Launch role). Returns a
    full-resolution [H,W,2] flow field (pixels, img1 -> img2)."""

    def __init__(self, image_hw, iters: int = 8,
                 params_path: str | None = None, seed: int = 0,
                 dtype=jnp.float32):
        self.model = RAFT(iters=iters, dtype=dtype)
        self.image_hw = tuple(image_hw)
        dummy = jnp.zeros((1,) + self.image_hw + (3,), dtype)
        self.params = self.model.init(jax.random.PRNGKey(seed), dummy,
                                      dummy)
        if params_path:
            from dynamic_vins_tpu.models.solov2 import load_params
            self.params = load_params(self.params, params_path)

        @jax.jit
        def _run(params, a, b):
            return self.model.apply(params,
                                    layers.normalize_image(a, dtype),
                                    layers.normalize_image(b, dtype))

        self._run = _run

    def __call__(self, img1, img2) -> np.ndarray:
        return np.asarray(self._run(self.params, img1, img2))
