"""Training callbacks for the jitted loop (parity: keras EarlyStopping with
restore_best_weights used by the fork, ``force_hdnnp4th.py:284-291``, and
``kgcnn/utils/callbacks.py:11`` TrainingTimeCallback)."""
from __future__ import annotations

import time
from typing import Any, Optional

import jax
import numpy as np


class EarlyStopping:
    def __init__(self, monitor: str = "val_loss", patience: int = 10,
                 min_delta: float = 0.0, mode: str = "min",
                 restore_best_weights: bool = True):
        self.monitor = monitor
        self.patience = patience
        self.min_delta = min_delta
        self.sign = 1.0 if mode == "min" else -1.0
        self.restore_best_weights = restore_best_weights
        self.best: Optional[float] = None
        self.best_params: Any = None
        self.wait = 0
        self.stopped_epoch: Optional[int] = None

    def update(self, epoch: int, metrics: dict, params) -> bool:
        """Returns True if training should stop."""
        value = self.sign * float(metrics[self.monitor])
        if self.best is None or value < self.best - self.min_delta:
            self.best = value
            self.wait = 0
            if self.restore_best_weights:
                self.best_params = jax.tree.map(np.asarray, params)
        else:
            self.wait += 1
            if self.wait >= self.patience:
                self.stopped_epoch = epoch
                return True
        return False

    def restore(self, params):
        if self.restore_best_weights and self.best_params is not None:
            return jax.tree.map(lambda x: x, self.best_params)
        return params


class TrainingTimer:
    """Per-epoch wall-clock tracker (TrainingTimeCallback analog)."""

    def __init__(self):
        self.epoch_times = []
        self._t0 = None

    def epoch_begin(self):
        self._t0 = time.perf_counter()

    def epoch_end(self):
        if self._t0 is not None:
            self.epoch_times.append(time.perf_counter() - self._t0)

    @property
    def mean_epoch_time(self) -> float:
        return float(np.mean(self.epoch_times)) if self.epoch_times else 0.0
