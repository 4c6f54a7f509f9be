"""SOLOv2 instance segmentation, TPU-native.

Capability parity with the reference's online 2D detector
(`det2d/detector2d.cpp:245` ForwardTensor + `det2d/solo_head.cpp:410`
GetSegTensor): a grid-based kernel/category head over an FPN, a unified
mask-feature branch, dynamic 1x1 convolution of predicted kernels
against the mask features, and **MatrixNMS** (`solo_head.cpp:31`).

TPU design notes (vs the reference's TensorRT engine + LibTorch
postprocess):
  * the dynamic mask head is a single [K,E] x [E, H*W] matmul (MXU),
  * MatrixNMS is two dense [K,K] matmuls + elementwise decay — no
    sequential suppression loop,
  * decode uses fixed capacities (`pre_nms`, `max_dets`) and returns
    masked fixed-shape arrays, so backbone + heads + full postprocess
    compile as ONE jit with zero host sync points.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from dynamic_vins_tpu.models import layers


class Solov2Head(nn.Module):
    """Per-FPN-level kernel + category branches (solo_head.cpp)."""

    num_classes: int = 80
    embed_dim: int = 64          # E: dynamic-conv kernel width
    grid_sizes: Sequence[int] = (36, 24, 16, 12)
    head_width: int = 64
    stacked_convs: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pyramid):
        kernels, scores = [], []
        kern_convs = [layers.ConvGN(self.head_width, dtype=self.dtype,
                                    name=f"kern{i}")
                      for i in range(self.stacked_convs)]
        cate_convs = [layers.ConvGN(self.head_width, dtype=self.dtype,
                                    name=f"cate{i}")
                      for i in range(self.stacked_convs)]
        kern_out = nn.Conv(self.embed_dim, (3, 3), padding="SAME",
                           dtype=self.dtype, name="kern_out")
        cate_out = nn.Conv(self.num_classes, (3, 3), padding="SAME",
                           dtype=self.dtype, name="cate_out",
                           bias_init=nn.initializers.constant(-4.6))
        for level, (feat, s) in enumerate(zip(pyramid, self.grid_sizes)):
            # resize level features onto the SxS prediction grid, with
            # normalized coord channels (CoordConv, as in SOLOv2)
            g = jax.image.resize(
                feat, (feat.shape[0], s, s, feat.shape[3]), "bilinear")
            ys = jnp.linspace(-1.0, 1.0, s, dtype=self.dtype)
            xs = jnp.linspace(-1.0, 1.0, s, dtype=self.dtype)
            yy, xx = jnp.meshgrid(ys, xs, indexing="ij")
            coord = jnp.broadcast_to(jnp.stack([yy, xx], -1)[None],
                                     (g.shape[0], s, s, 2))
            k = jnp.concatenate([g, coord], -1)
            c = g
            for conv in kern_convs:
                k = conv(k)
            for conv in cate_convs:
                c = conv(c)
            kernels.append(kern_out(k).reshape(g.shape[0], s * s,
                                               self.embed_dim))
            scores.append(cate_out(c).reshape(g.shape[0], s * s,
                                              self.num_classes))
        return (jnp.concatenate(kernels, 1),       # [B, G, E]
                jnp.concatenate(scores, 1))        # [B, G, C]


class Solov2(nn.Module):
    """Backbone + FPN + SOLOv2 head + mask feature branch."""

    num_classes: int = 80
    embed_dim: int = 64
    grid_sizes: Sequence[int] = (36, 24, 16, 12)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, img):
        feats = layers.Backbone(dtype=self.dtype)(img)
        pyramid = layers.FPN(64, dtype=self.dtype)(feats)
        assert len(pyramid) == len(self.grid_sizes), \
            "one grid size per FPN level"
        kernels, scores = Solov2Head(
            self.num_classes, self.embed_dim, self.grid_sizes,
            dtype=self.dtype)(pyramid)
        # mask feature branch: fuse P2..P5 at 1/4 resolution
        hw = pyramid[0].shape[1:3]
        fused = sum(layers.upsample_to(p, hw) for p in pyramid)
        mask_feat = layers.ConvGN(self.embed_dim, dtype=self.dtype,
                                  name="mask_feat")(fused)
        return kernels, scores, mask_feat          # [B,G,E],[B,G,C],[B,h,w,E]


def matrix_nms(masks_bin, labels, scores, sigma: float = 2.0):
    """MatrixNMS (solo_head.cpp:31) — fully parallel decay NMS.

    masks_bin: [K, P] float {0,1} binarized masks sorted by score desc;
    labels: [K]; scores: [K]. Returns decayed scores [K].
    On TPU the K x K IoU matrix is one matmul on the MXU.
    """
    areas = masks_bin.sum(-1)                                   # [K]
    inter = masks_bin @ masks_bin.T                             # [K,K]
    union = areas[:, None] + areas[None, :] - inter
    iou = inter / jnp.maximum(union, 1.0)
    k = masks_bin.shape[0]
    upper = jnp.triu(jnp.ones((k, k), bool), 1)                 # j < i
    same = labels[:, None] == labels[None, :]
    iou = jnp.where(upper.T & same, iou, 0.0)                   # iou[i,j], j<i
    # row j of the kept matrix = IoU of mask j with all higher-scored
    # masks -> the "compensate IoU" of j (solo_head.cpp decay term)
    iou_max = jnp.max(iou, axis=1)
    decay = jnp.exp(-(iou ** 2 - iou_max[None, :] ** 2) / sigma)
    decay = jnp.where(upper.T & same, decay, 1.0)
    return scores * jnp.min(decay, axis=1)


class SegOutput(NamedTuple):
    """Fixed-capacity decode result (valid where score > 0)."""

    masks: jnp.ndarray      # [max_dets, H, W] bool (input resolution)
    scores: jnp.ndarray     # [max_dets]
    labels: jnp.ndarray     # [max_dets] int32


def decode(kernels, scores, mask_feat, out_hw,
           score_thresh: float = 0.3, mask_thresh: float = 0.5,
           update_thresh: float = 0.05, pre_nms: int = 128,
           max_dets: int = 32) -> SegOutput:
    """SOLOv2 postprocess as one fused device function
    (GetSegTensor solo_head.cpp:410-520 semantics).
    """
    kernels, scores, mask_feat = kernels[0], scores[0], mask_feat[0]
    cls_score = jax.nn.sigmoid(scores.astype(jnp.float32))      # [G,C]
    best = cls_score.max(-1)
    label = cls_score.argmax(-1).astype(jnp.int32)
    best = jnp.where(best >= score_thresh, best, 0.0)
    top, idx = jax.lax.top_k(best, pre_nms)                     # [K]
    label = label[idx]
    kern = kernels[idx].astype(jnp.float32)                     # [K,E]

    h, w, e = mask_feat.shape
    logits = kern @ mask_feat.astype(jnp.float32).reshape(h * w, e).T
    prob = jax.nn.sigmoid(logits)                               # [K,hw]
    binm = (prob > mask_thresh).astype(jnp.float32)
    area = binm.sum(-1)
    # mask quality: mean probability inside the binary mask
    quality = (prob * binm).sum(-1) / jnp.maximum(area, 1.0)
    score = top * quality * (area > 0)

    # sort by combined score before MatrixNMS (decay needs desc order)
    score, order = jax.lax.top_k(score, pre_nms)
    binm, prob, label = binm[order], prob[order], label[order]
    score = matrix_nms(binm, label, score)
    score = jnp.where(score >= update_thresh, score, 0.0)

    score, order = jax.lax.top_k(score, max_dets)
    final = prob[order].reshape(max_dets, h, w)
    final = jax.image.resize(final, (max_dets,) + tuple(out_hw),
                             "bilinear")
    return SegOutput(final > mask_thresh, score, label[order])


class OnlineDetector2D:
    """Online segmentation stage: same role as `Detector2D::Launch`
    (detector2d.cpp:419) in online mode, producing `SegResult`.

    Weights: randomly initialized unless `params_path` (an .npz of
    flattened flax params) is given — the container ships no pretrained
    checkpoints; the architecture + fused decode are the deliverable
    and `load_params` accepts trained weights.
    """

    def __init__(self, image_hw, num_classes: int = 80,
                 score_thresh: float = 0.3, max_dets: int = 32,
                 grid_sizes: Sequence[int] = (36, 24, 16, 12),
                 embed_dim: int = 64,
                 params_path: str | None = None, seed: int = 0,
                 dtype=jnp.float32):
        self.model = Solov2(num_classes=num_classes,
                            embed_dim=embed_dim,
                            grid_sizes=tuple(grid_sizes), dtype=dtype)
        self.image_hw = tuple(image_hw)
        dummy = jnp.zeros((1,) + self.image_hw + (3,), dtype)
        self.params = self.model.init(jax.random.PRNGKey(seed), dummy)
        if params_path:
            self.params = load_params(self.params, params_path)

        @jax.jit
        def _run(params, img):
            x = layers.normalize_image(img, dtype)
            kernels, sc, mfeat = self.model.apply(params, x)
            return decode(kernels, sc, mfeat, self.image_hw,
                          score_thresh=score_thresh, max_dets=max_dets)

        self._run = _run

    def __call__(self, img) -> "SegResult":
        from dynamic_vins_tpu.io.perception import SegResult

        out = self._run(self.params, img)
        keep = np.asarray(out.scores) > 0
        return SegResult(np.asarray(out.masks)[keep],
                         np.asarray(out.scores)[keep],
                         np.asarray(out.labels)[keep])


def save_params(params, path: str):
    flat = {"/".join(map(str, k)): np.asarray(v) for k, v in
            jax.tree_util.tree_flatten_with_path(params)[0]}
    np.savez(path, **{k.replace("[", "(").replace("]", ")"): v
                      for k, v in flat.items()})


def load_params(template, path: str):
    """Load an .npz produced by `save_params` into `template`'s tree."""
    data = np.load(path)
    leaves, treedef = jax.tree_util.tree_flatten_with_path(template)
    out = []
    for k, v in leaves:
        key = "/".join(map(str, k)).replace("[", "(").replace("]", ")")
        if key in data.files:
            # shipped checkpoints may be stored float16/compressed;
            # cast back to the model's compute dtype
            out.append(jnp.asarray(data[key], dtype=v.dtype))
        else:
            out.append(v)
    return jax.tree_util.tree_unflatten(treedef, out)
