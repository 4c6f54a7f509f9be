"""Shared network building blocks for the online perception models.

TPU-native conventions used across all models in this package:
  * NHWC layout (XLA's native TPU conv layout — keeps the MXU fed
    without transposes),
  * GroupNorm instead of BatchNorm (batch-1 inference, no running
    stats to manage),
  * every spatial size is static; decode stages use fixed top-k
    capacities so the whole net + postprocess jits once,
  * optional bfloat16 compute with float32 params/normalization.

The reference runs its nets through TensorRT/LibTorch
(`det2d/detector2d.cpp:245`, `flow/raft.cpp:71`); here the same model
families are expressed as flax modules compiled by XLA.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


class ConvGN(nn.Module):
    """Conv -> GroupNorm -> activation."""

    features: int
    kernel: int = 3
    strides: int = 1
    groups: int = 8
    act: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.strides, self.strides),
                    padding="SAME", use_bias=False,
                    dtype=self.dtype)(x)
        g = min(self.groups, self.features)
        x = nn.GroupNorm(num_groups=g, dtype=jnp.float32)(x)
        if self.act:
            x = nn.relu(x)
        return x


class BasicBlock(nn.Module):
    """ResNet-18 style residual block."""

    features: int
    strides: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = ConvGN(self.features, 3, self.strides, dtype=self.dtype)(x)
        y = ConvGN(self.features, 3, 1, act=False, dtype=self.dtype)(y)
        if x.shape[-1] != self.features or self.strides != 1:
            x = ConvGN(self.features, 1, self.strides, act=False,
                       dtype=self.dtype)(x)
        return nn.relu(x + y)


class Backbone(nn.Module):
    """Small ResNet backbone returning C2..C5 (strides 4,8,16,32)."""

    widths: Sequence[int] = (32, 64, 128, 256)
    blocks_per_stage: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = ConvGN(self.widths[0], 7, 2, dtype=self.dtype)(x)   # /2
        x = nn.max_pool(x, (2, 2), strides=(2, 2))              # /4
        feats = []
        for i, w in enumerate(self.widths):
            stride = 1 if i == 0 else 2
            x = BasicBlock(w, stride, dtype=self.dtype)(x)
            for _ in range(self.blocks_per_stage - 1):
                x = BasicBlock(w, 1, dtype=self.dtype)(x)
            feats.append(x)
        return feats                                            # C2..C5


class FPN(nn.Module):
    """Top-down feature pyramid: C2..C5 -> P2..P5, all `features` wide."""

    features: int = 64
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats):
        laterals = [nn.Conv(self.features, (1, 1), dtype=self.dtype,
                            name=f"lat{i}")(f)
                    for i, f in enumerate(feats)]
        out = [laterals[-1]]
        for lat in reversed(laterals[:-1]):
            up = jax.image.resize(out[0], lat.shape, "nearest")
            out.insert(0, lat + up)
        return [nn.Conv(self.features, (3, 3), padding="SAME",
                        dtype=self.dtype, name=f"post{i}")(p)
                for i, p in enumerate(out)]


def upsample_to(x, hw, method="bilinear"):
    """Resize NHWC (or HWC) tensor spatially to `hw`."""
    if x.ndim == 4:
        shape = (x.shape[0], hw[0], hw[1], x.shape[3])
    else:
        shape = (hw[0], hw[1], x.shape[2])
    return jax.image.resize(x, shape, method)


def normalize_image(img, dtype=jnp.float32):
    """[H,W] or [H,W,C] uint8/float image -> normalized NHWC float.

    Mirrors the reference's input pipeline mean/std normalization
    (det2d/pipeline.cpp image->NCHW norm tensor); grayscale inputs are
    broadcast to 3 channels so one backbone serves all datasets.
    """
    x = jnp.asarray(img, dtype) / 255.0
    if x.ndim == 2:
        x = x[..., None]
    if x.shape[-1] == 1:
        x = jnp.repeat(x, 3, axis=-1)
    x = (x - 0.45) / 0.225
    return x[None]                                              # NHWC
