"""Optax train state + data-parallel train step + checkpoints.

TPU-native scaling follows the mesh/sharding recipe: build a
`jax.sharding.Mesh` over the data axis, annotate the batch with
`NamedSharding(P('data', ...))` and params as replicated, and let XLA
insert the gradient `psum` over ICI. The same step runs unchanged on
one chip, an 8-way virtual CPU mesh (tests), or a pod slice.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dynamic_vins_tpu.models.solov2 import load_params, save_params


class TrainConfig(NamedTuple):
    learning_rate: float = 1e-3
    weight_decay: float = 1e-4
    grad_clip: float = 1.0
    warmup_steps: int = 20
    total_steps: int = 1000
    min_lr_frac: float = 0.05


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    schedule = optax.warmup_cosine_decay_schedule(
        init_value=cfg.learning_rate * 0.1,
        peak_value=cfg.learning_rate,
        warmup_steps=cfg.warmup_steps,
        decay_steps=max(cfg.total_steps, cfg.warmup_steps + 1),
        end_value=cfg.learning_rate * cfg.min_lr_frac)
    return optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip),
        optax.adamw(schedule, weight_decay=cfg.weight_decay))


def data_parallel_mesh(n_devices: int | None = None) -> Mesh:
    """1-D mesh over the first n devices (all by default)."""
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), ("data",))


class Trainer:
    """Generic trainer: loss_fn(params, batch) -> (loss, aux).

    With a mesh, the batch leaves shard over 'data' (their leading
    axis must divide the mesh size) and params/optimizer state
    replicate; gradients all-reduce via the compiler-inserted psum.
    """

    def __init__(self, loss_fn: Callable[[Any, Any], tuple],
                 params, cfg: TrainConfig = TrainConfig(),
                 mesh: Mesh | None = None):
        self.cfg = cfg
        self.tx = make_optimizer(cfg)
        self.params = params
        self.opt_state = self.tx.init(params)
        self.mesh = mesh
        self.step_count = 0

        def train_step(params, opt_state, batch):
            (loss, aux), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params, batch)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss, aux

        if mesh is not None:
            repl = NamedSharding(mesh, P())
            shard = NamedSharding(mesh, P("data"))
            self._batch_sharding = shard
            # pytree-prefix rule: one sharding covers the whole batch tree
            self._step = jax.jit(
                train_step,
                in_shardings=(repl, repl, shard),
                out_shardings=(repl, repl, None, None))
            self.params = jax.device_put(self.params, repl)
            self.opt_state = jax.device_put(self.opt_state, repl)
        else:
            self._batch_sharding = None
            self._step = jax.jit(train_step)

    def place_batch(self, batch):
        if self._batch_sharding is None:
            return batch
        return jax.tree.map(
            lambda a: jax.device_put(jnp.asarray(a),
                                     self._batch_sharding), batch)

    def step(self, batch):
        """One optimizer step; returns (loss, aux) as host floats."""
        batch = self.place_batch(batch)
        self.params, self.opt_state, loss, aux = self._step(
            self.params, self.opt_state, batch)
        self.step_count += 1
        return float(loss), jax.tree.map(float, aux)

    # ------------------------------------------------------------------
    def save(self, path: str):
        """Checkpoint params (same .npz layout as models load_params)."""
        save_params(self.params, path)

    def load(self, path: str):
        self.params = load_params(self.params, path)
        if self.mesh is not None:
            self.params = jax.device_put(
                self.params, NamedSharding(self.mesh, P()))
