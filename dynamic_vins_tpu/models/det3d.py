"""Monocular 3D detection head (FCOS3D/PGD family), TPU-native.

Capability parity with the reference's Detector3D: there the net runs
offline (`scripts/python/fcos3d_det3d_kitti.py`, mmdet3d) and the
system reads per-frame txt boxes (`det3d/detector3d.cpp:64-90`,
offline-only by design — `detector3d.cpp:36`). This module is the
ONLINE equivalent: an anchor-free per-pixel 3D regression head over an
FPN whose decoded output is the same `Box3D` list
(`basic/box3d.h:41` semantics: camera-frame bottom_center, dims, yaw
about -y) consumed by `BoxAssociate2Dto3D`.

Per-location predictions (FCOS3D parameterization):
  class scores [C], centerness [1], 2D offset to the projected 3D
  center [2], log depth [1], log dims [3], yaw as (sin, cos) [2].
Decode lifts (u,v,depth) through the pinhole intrinsics — done inside
the same jit, fixed top-k capacity, no host round-trips.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from dynamic_vins_tpu.models import layers


class FCOS3DHead(nn.Module):
    num_classes: int = 10        # NuScenes classes (perception.py map)
    width: int = 64
    stacked_convs: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pyramid):
        cls_convs = [layers.ConvGN(self.width, dtype=self.dtype,
                                   name=f"cls{i}")
                     for i in range(self.stacked_convs)]
        reg_convs = [layers.ConvGN(self.width, dtype=self.dtype,
                                   name=f"reg{i}")
                     for i in range(self.stacked_convs)]
        cls_out = nn.Conv(self.num_classes, (3, 3), padding="SAME",
                          dtype=self.dtype, name="cls_out",
                          bias_init=nn.initializers.constant(-4.6))
        ctr_out = nn.Conv(1, (3, 3), padding="SAME", dtype=self.dtype,
                          name="ctr_out")
        reg_out = nn.Conv(8, (3, 3), padding="SAME", dtype=self.dtype,
                          name="reg_out")
        outs = []
        for feat in pyramid:
            c = feat
            r = feat
            for conv in cls_convs:
                c = conv(c)
            for conv in reg_convs:
                r = conv(r)
            outs.append((cls_out(c), ctr_out(c), reg_out(r)))
        return outs


class Det3DOutput(NamedTuple):
    """Fixed-capacity decode (valid where score > 0)."""

    scores: jnp.ndarray         # [K]
    labels: jnp.ndarray         # [K] int32
    centers: jnp.ndarray        # [K,3] camera-frame 3D box centers
    dims: jnp.ndarray           # [K,3]
    yaws: jnp.ndarray           # [K]


class FCOS3D(nn.Module):
    num_classes: int = 10
    strides: Sequence[int] = (8, 16, 32, 64)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, img):
        feats = layers.Backbone(dtype=self.dtype)(img)
        pyramid = layers.FPN(64, dtype=self.dtype)(feats)
        # use P3..P5 + extra P6 for the detection levels
        p6 = nn.max_pool(pyramid[-1], (2, 2), strides=(2, 2))
        return FCOS3DHead(self.num_classes,
                          dtype=self.dtype)(pyramid[1:] + [p6])


def decode(level_outputs, strides, intrinsics, score_thresh=0.2,
           max_dets: int = 16) -> Det3DOutput:
    """Per-pixel predictions -> top-k camera-frame 3D boxes."""
    fx, fy, cx, cy = intrinsics
    scores_all, labels_all, box_all = [], [], []
    for (cls, ctr, reg), s in zip(level_outputs, strides):
        cls, ctr, reg = cls[0], ctr[0], reg[0]
        h, w, c = cls.shape
        prob = jax.nn.sigmoid(cls.astype(jnp.float32)) * \
            jax.nn.sigmoid(ctr.astype(jnp.float32))
        us = (jnp.arange(w, dtype=jnp.float32) + 0.5) * s
        vs = (jnp.arange(h, dtype=jnp.float32) + 0.5) * s
        uu, vv = jnp.meshgrid(us, vs, indexing="xy")
        reg = reg.astype(jnp.float32)
        u = uu + reg[..., 0] * s
        v = vv + reg[..., 1] * s
        depth = jnp.exp(reg[..., 2])
        dims = jnp.exp(reg[..., 3:6])
        yaw = jnp.arctan2(reg[..., 6], reg[..., 7])
        x = (u - cx) / fx * depth
        y = (v - cy) / fy * depth
        box = jnp.stack([x, y, depth, dims[..., 0], dims[..., 1],
                         dims[..., 2], yaw], -1)
        scores_all.append(prob.max(-1).reshape(-1))
        labels_all.append(prob.argmax(-1).astype(jnp.int32).reshape(-1))
        box_all.append(box.reshape(-1, 7))
    scores = jnp.concatenate(scores_all)
    scores = jnp.where(scores >= score_thresh, scores, 0.0)
    top, idx = jax.lax.top_k(scores, max_dets)
    labels = jnp.concatenate(labels_all)[idx]
    box = jnp.concatenate(box_all, 0)[idx]
    return Det3DOutput(top, labels, box[:, :3], box[:, 3:6], box[:, 6])


class OnlineDetector3D:
    """Online mono 3D detection stage producing `perception.Box3D`
    objects (bottom_center convention of Box3dFromFCOS3D,
    basic/box3d.cpp:27-90).
    """

    def __init__(self, image_hw, intrinsics, num_classes: int = 10,
                 score_thresh: float = 0.2, max_dets: int = 16,
                 params_path: str | None = None, seed: int = 0,
                 dtype=jnp.float32):
        self.model = FCOS3D(num_classes=num_classes, dtype=dtype)
        self.image_hw = tuple(image_hw)
        dummy = jnp.zeros((1,) + self.image_hw + (3,), dtype)
        self.params = self.model.init(jax.random.PRNGKey(seed), dummy)
        if params_path:
            from dynamic_vins_tpu.models.solov2 import load_params
            self.params = load_params(self.params, params_path)
        intr = tuple(float(v) for v in intrinsics)

        @jax.jit
        def _run(params, img):
            x = layers.normalize_image(img, dtype)
            outs = self.model.apply(params, x)
            return decode(outs, self.model.strides, intr,
                          score_thresh=score_thresh, max_dets=max_dets)

        self._run = _run

    def __call__(self, img):
        from dynamic_vins_tpu.io.perception import (NUSCENES_TO_KITTI,
                                                    Box3D)

        out = self._run(self.params, img)
        boxes = []
        for i in range(len(np.asarray(out.scores))):
            s = float(out.scores[i])
            if s <= 0:
                continue
            dims = np.asarray(out.dims[i])
            center = np.asarray(out.centers[i])
            bottom = center.copy()
            bottom[1] += dims[1] / 2.0
            boxes.append(Box3D(
                class_name=NUSCENES_TO_KITTI.get(int(out.labels[i]),
                                                 "DontCare"),
                score=s, bottom_center=bottom, dims=dims,
                yaw=float(out.yaws[i])))
        return boxes
