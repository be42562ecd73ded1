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

    def multi_step_fn(self) -> Callable:
        """K optimizer steps over K stacked batches inside ONE jitted
        lax.scan — one dispatch instead of K. Measured r3: every tunneled
        dispatch costs 0.5-3.5 ms of pure launch latency (PERF.md
        "timing instruments"), so fusing dispatches recovers ~6% (SchNet)
        to ~26% (HDNNP4th flagship) of training wall time."""
        if getattr(self, "_multi", None) is None:
            base = self._dp_step if self.mesh is not None \
                else self._single_device_step

            def multi(state, stacked):
                state, ms = jax.lax.scan(base, state, stacked)
                return state, jax.tree.map(lambda x: jnp.mean(x, axis=0), ms)

            self._multi = jax.jit(multi, donate_argnums=(0,))
        return self._multi

    @staticmethod
    def _shape_key(batch) -> tuple:
        leaves, treedef = jax.tree_util.tree_flatten(batch)
        return (treedef,) + tuple((l.shape, getattr(l, "dtype", None))
                                  for l in leaves)

    def fit_epoch(self, state: TrainState, batches,
                  steps_per_dispatch: int = 1
                  ) -> Tuple[TrainState, Dict[str, float]]:
        step = self.step_fn()
        agg: Dict[str, float] = {}
        count = 0

        def apply_metrics(metrics, n):
            nonlocal count
            count += n
            for k, v in metrics.items():
                agg[k] = agg.get(k, 0.0) + float(v) * n

        if steps_per_dispatch <= 1:
            for batch in batches:
                state, metrics = step(state, batch)
                apply_metrics(metrics, 1)
            return state, {k: v / max(count, 1) for k, v in agg.items()}

        multi = self.multi_step_fn()
        group, group_key = [], None
        pending = batches

        def flush():
            nonlocal state, group, group_key
            if len(group) == steps_per_dispatch:
                stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *group)
                state, metrics = multi(state, stacked)
                apply_metrics(metrics, len(group))
            else:
                # partial/mismatched groups run as single steps — a scan of
                # every leftover length would each compile separately
                for b in group:
                    st, metrics = step(state, b)
                    state = st
                    apply_metrics(metrics, 1)
            group, group_key = [], None

        for batch in pending:
            key = self._shape_key(batch)
            if group_key is not None and (key != group_key
                                          or len(group) >= steps_per_dispatch):
                flush()
            if group_key is None:
                group_key = key
            group.append(batch)
            if len(group) >= steps_per_dispatch:
                flush()
        flush()
        return state, {k: v / max(count, 1) for k, v in agg.items()}
