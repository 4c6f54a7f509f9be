"""Appearance (ReID) embedding network for MOT, TPU-native.

Capability parity with the reference's DeepSORT appearance branch
(`mot/extractor.cpp:31-52` traced LibTorch ReID CNN + `mot/reid_net.h`;
cosine-distance matching in `mot/deep_sort.cpp:99`). Produces
L2-normalized embeddings for batches of fixed-size box crops; plugs
into `MultiObjectTracker(embed_fn=...)`.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from dynamic_vins_tpu.models import layers

CROP_HW = (64, 32)      # h, w of the ReID input crop (DeepSORT: 128x64)


class ReidNet(nn.Module):
    embed_dim: int = 128
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):                        # [B,h,w,3]
        x = layers.ConvGN(32, 3, 1, dtype=self.dtype)(x)
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = layers.BasicBlock(32, dtype=self.dtype)(x)
        x = layers.BasicBlock(64, 2, dtype=self.dtype)(x)
        x = layers.BasicBlock(128, 2, dtype=self.dtype)(x)
        x = x.mean(axis=(1, 2))                   # GAP
        x = nn.Dense(self.embed_dim, dtype=self.dtype)(x)
        x = x.astype(jnp.float32)
        return x / jnp.maximum(jnp.linalg.norm(x, axis=-1,
                                               keepdims=True), 1e-6)


class ReidExtractor:
    """Crop + resize + embed, fixed batch capacity (one compile)."""

    def __init__(self, max_boxes: int = 16,
                 params_path: str | None = None, seed: int = 0,
                 dtype=jnp.float32):
        self.model = ReidNet(dtype=dtype)
        self.max_boxes = max_boxes
        dummy = jnp.zeros((max_boxes,) + CROP_HW + (3,), dtype)
        self.params = self.model.init(jax.random.PRNGKey(seed), dummy)
        if params_path:
            from dynamic_vins_tpu.models.solov2 import load_params
            self.params = load_params(self.params, params_path)
        self._run = jax.jit(
            lambda p, x: self.model.apply(p, x))

    def __call__(self, img, boxes) -> np.ndarray:
        """img [H,W](gray)/[H,W,3]; boxes [N,4] tlbr -> [N,embed]."""
        if img.ndim == 2:
            img = np.repeat(img[..., None], 3, -1)
        n = min(len(boxes), self.max_boxes)
        crops = np.zeros((self.max_boxes,) + CROP_HW + (3,), np.float32)
        for i in range(n):
            x0, y0, x1, y1 = [int(v) for v in boxes[i]]
            x0, y0 = max(x0, 0), max(y0, 0)
            x1 = min(max(x1, x0 + 1), img.shape[1])
            y1 = min(max(y1, y0 + 1), img.shape[0])
            crop = img[y0:y1, x0:x1].astype(np.float32)
            crops[i] = _resize_np(crop, CROP_HW)
        crops = (crops / 255.0 - 0.45) / 0.225
        emb = np.asarray(self._run(self.params, jnp.asarray(crops)))
        return emb[:n]


def _resize_np(img, hw):
    """Nearest-neighbor host resize (crops are tiny; keep IO simple)."""
    h, w = hw
    ys = (np.arange(h) * img.shape[0] / h).astype(int)
    xs = (np.arange(w) * img.shape[1] / w).astype(int)
    return img[ys][:, xs]
