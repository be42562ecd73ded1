"""Jit-compiled training loop (replaces keras ``model.fit`` in the
reference drivers, e.g. ``training/train_force.py:201``).

A ``Trainer`` owns an optax optimizer and builds a donated, jit-compiled
``step(state, batch)``; with a mesh it builds a ``shard_map`` data-parallel
step where each device consumes its own sub-batch and gradients are
``psum``-reduced over the ICI mesh (the reference has no distributed path at
all — SURVEY §2.12).
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct


from ..batch import GraphBatch

Array = jax.Array


@struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: Array
    batch_stats: Any = None


class Trainer:
    """loss_fn(params, batch) -> (loss, metrics_dict) — built by caller from
    the model apply; Trainer adds optimizer, jit, donation and DP."""

    def __init__(self, loss_fn: Callable, optimizer: optax.GradientTransformation,
                 mesh: Optional[jax.sharding.Mesh] = None,
                 data_axis: str = "data"):
        self.loss_fn = loss_fn
        self.optimizer = optimizer
        self.mesh = mesh
        self.data_axis = data_axis
        self._step = None

    def init_state(self, params) -> TrainState:
        return TrainState(params=params, opt_state=self.optimizer.init(params),
                          step=jnp.zeros((), jnp.int32))

    def _single_device_step(self, state: TrainState, batch: GraphBatch):
        (loss, metrics), grads = jax.value_and_grad(self.loss_fn, has_aux=True)(
            state.params, batch)
        updates, opt_state = self.optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = dict(metrics)
        metrics["loss"] = loss
        return TrainState(params=params, opt_state=opt_state,
                          step=state.step + 1,
                          batch_stats=state.batch_stats), metrics

    def _dp_step(self, state: TrainState, batches: GraphBatch):
        """``batches`` is a GraphBatch whose arrays have a leading device
        axis of size mesh.shape[data_axis]. Delegates to the ONE shard_map
        DP implementation in ``parallel.data_parallel``."""
        from ..parallel.data_parallel import shard_map_train_step

        sharded = shard_map_train_step(self.loss_fn, self.optimizer,
                                       self.mesh, self.data_axis)
        params, opt_state, metrics = sharded(state.params, state.opt_state,
                                             batches)
        return TrainState(params=params, opt_state=opt_state,
                          step=state.step + 1,
                          batch_stats=state.batch_stats), metrics

    def step_fn(self) -> Callable:
        if self._step is None:
            fn = self._dp_step if self.mesh is not None else self._single_device_step
            self._step = jax.jit(fn, donate_argnums=(0,))
        return self._step

    def fit_epoch(self, state: TrainState, batches) -> Tuple[TrainState, Dict[str, float]]:
        step = self.step_fn()
        agg: Dict[str, float] = {}
        count = 0
        for batch in batches:
            state, metrics = step(state, batch)
            count += 1
            for k, v in metrics.items():
                agg[k] = agg.get(k, 0.0) + float(v)
        return state, {k: v / max(count, 1) for k, v in agg.items()}
