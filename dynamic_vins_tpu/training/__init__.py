"""Training infrastructure for the online perception models.

The reference consumes frozen checkpoints (TensorRT engines /
offline-preprocessed artifacts, SURVEY.md §2 L2) and ships no training
code. This package goes beyond parity: each model family in `models/`
gets a supervised loss, a synthetic data source with exact labels, and
a data-parallel train step sharded over a `jax.sharding.Mesh` — so the
online nets are trainable end-to-end on TPU without external datasets.

  losses.py  — per-family losses (stereo / flow / SOLOv2 / FCOS3D / ReID)
  data.py    — synthetic labeled batch generators (exact ground truth)
  trainer.py — optax train state, sharded train step, checkpoint I/O
"""

from dynamic_vins_tpu.training.trainer import (Trainer, TrainConfig,
                                               data_parallel_mesh)

__all__ = ["Trainer", "TrainConfig", "data_parallel_mesh"]
