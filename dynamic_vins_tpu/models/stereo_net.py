"""End-to-end stereo disparity network, TPU-native.

Capability parity with the reference's LEAStereo stage — there the
disparity net runs offline (`scripts/python/leastereo_kitti.py`) and
the system reads `disp = png/256` (`stereo/stereo.cpp:32-44`). This
module provides the ONLINE equivalent: a correlation-volume stereo
net whose output plugs into the same `FrameInput.disparity` slot.

Architecture (LEAStereo's shape, sized for real-time):
  feature net (shared, 1/4 res) -> left/right feature maps ->
  correlation cost volume over D/4 candidate disparities ->
  3D conv aggregation -> soft-argmin disparity regression ->
  bilinear upsample x4 and rescale.

TPU design notes:
  * the cost volume is built with `lax.dynamic_slice` shifts + an
    einsum per disparity batch — group-wise correlation keeps it a
    contraction (MXU) instead of a bandwidth-bound concat volume;
  * aggregation uses NDHWC 3D convs (XLA lowers these natively);
  * soft-argmin keeps everything differentiable and branch-free.
"""

from __future__ import annotations

from typing import NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from dynamic_vins_tpu.models import layers


class FeatureNet(nn.Module):
    """Shared siamese feature extractor at 1/4 resolution."""

    width: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = layers.ConvGN(self.width, 3, 2, dtype=self.dtype)(x)   # /2
        x = layers.ConvGN(self.width, 3, 1, dtype=self.dtype)(x)
        x = layers.ConvGN(self.width * 2, 3, 2, dtype=self.dtype)(x)  # /4
        for _ in range(3):
            x = layers.BasicBlock(self.width * 2, dtype=self.dtype)(x)
        return nn.Conv(self.width, (1, 1), dtype=self.dtype)(x)


def correlation_volume(fl, fr, max_disp: int, groups: int = 8):
    """Group-wise correlation cost volume.

    fl, fr: [B,H,W,C] left/right features. Returns [B,D,H,W,G] where
    entry d holds corr(left[x], right[x-d]). The per-disparity shift is
    a pad+slice (no gather), and the correlation is a grouped
    contraction that XLA maps onto the MXU.
    """
    b, h, w, c = fl.shape
    g = c // groups
    fl_g = fl.reshape(b, h, w, groups, g)

    def one(d):
        shifted = jnp.pad(fr, ((0, 0), (0, 0), (d, 0), (0, 0)))[:, :, :w]
        fr_g = shifted.reshape(b, h, w, groups, g)
        return jnp.einsum("bhwgc,bhwgc->bhwg", fl_g, fr_g) / np.sqrt(g)

    vol = jnp.stack([one(d) for d in range(max_disp)], axis=1)
    return vol                                              # [B,D,H,W,G]


class Aggregation(nn.Module):
    """3D conv cost aggregation (LEAStereo matching net role)."""

    width: int = 16
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, vol):
        conv = lambda f, name: nn.Conv(f, (3, 3, 3), padding="SAME",
                                       dtype=self.dtype, name=name)
        x = nn.relu(conv(self.width, "c0")(vol))
        for i in range(3):
            y = nn.relu(conv(self.width, f"c{i}a")(x))
            y = conv(self.width, f"c{i}b")(y)
            x = nn.relu(x + y)
        return conv(1, "out")(x)[..., 0]                    # [B,D,H,W]


class StereoNet(nn.Module):
    max_disp: int = 192          # full-res disparity range
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, left, right):
        fnet = FeatureNet(dtype=self.dtype)
        fl, fr = fnet(left), fnet(right)
        d4 = self.max_disp // 4
        vol = correlation_volume(fl, fr, d4)
        cost = Aggregation(dtype=self.dtype)(vol)           # [B,D/4,h,w]
        prob = jax.nn.softmax(-cost.astype(jnp.float32), axis=1)
        cand = jnp.arange(d4, dtype=jnp.float32)
        disp = jnp.einsum("bdhw,d->bhw", prob, cand)        # soft argmin
        full = jax.image.resize(
            disp[..., None], (left.shape[0], left.shape[1],
                              left.shape[2], 1), "bilinear")[..., 0]
        return full * 4.0                                   # rescale


class OnlineStereoMatcher:
    """Online stereo stage: fills the role of `MyStereoMatcher`
    (stereo/stereo.cpp:27-44) when not reading offline PNGs. Output is
    a full-resolution float disparity map in left-image pixels — the
    same convention as the offline `read_disparity_png` path, so the
    downstream extra-point extraction (`instance_feature.cpp:413`
    depth = fx*baseline/disp) is unchanged.
    """

    def __init__(self, image_hw, max_disp: int = 128,
                 params_path: str | None = None, seed: int = 0,
                 dtype=jnp.float32):
        self.model = StereoNet(max_disp=max_disp, dtype=dtype)
        self.image_hw = tuple(image_hw)
        dummy = jnp.zeros((1,) + self.image_hw + (3,), dtype)
        self.params = self.model.init(jax.random.PRNGKey(seed), dummy,
                                      dummy)
        if params_path:
            from dynamic_vins_tpu.models.solov2 import load_params
            self.params = load_params(self.params, params_path)

        @jax.jit
        def _run(params, left, right):
            l = layers.normalize_image(left, dtype)
            r = layers.normalize_image(right, dtype)
            return self.model.apply(params, l, r)[0]

        self._run = _run

    def __call__(self, left, right) -> np.ndarray:
        return np.asarray(self._run(self.params, left, right))
