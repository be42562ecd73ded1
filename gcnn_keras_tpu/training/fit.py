"""Shared epoch loop with validation, early stopping, wandb and timing —
the jit-era analog of the reference's ``model.fit(callbacks=[...])`` block
(``/root/reference/force_hdnnp4th.py:284-295``: LinearLearningRateScheduler
+ TrainingTimeCallback + EarlyStopping(restore_best_weights=True) +
optional WandbWizard callback).

Every training driver and fork script routes its epoch loop through
``fit_model`` so the callback semantics exist ONCE.
"""
from __future__ import annotations

from typing import Callable, Dict, List, Optional

from .callbacks import EarlyStopping, TrainingTimer
from ..utils.wandb_wizard import log_wandb


def fit_model(trainer, state, epoch_batches, eval_fn: Optional[Callable],
              epochs: int, *, steps_per_dispatch: int = 1,
              early_stopping: int = 0, monitor: str = "val_loss",
              min_delta: float = 0.0, verbose_every: int = 10,
              fold: int = 0, wandb_prefix: str = "",
              timer: Optional[TrainingTimer] = None):
    """Run ``epochs`` epochs of ``trainer.fit_epoch`` with per-epoch
    validation and keras-style callbacks.

    - ``epoch_batches``: iterable of batches, or a zero-arg callable
      returning one (called fresh each epoch, e.g. a reshuffling loader).
    - ``eval_fn(params) -> {metric: float}``: validation metrics appended
      to the history each epoch (must include ``monitor`` when
      ``early_stopping > 0``). ``None`` disables validation.
    - ``early_stopping``: patience in epochs; 0 disables (the reference's
      ``energy_early_stopping`` config semantics,
      force_hdnnp4th.py:284-291). When the callback stops training, the
      BEST weights seen are restored into the returned state — and ONLY
      then, mirroring keras ``restore_best_weights=True`` (weights from
      the last epoch are kept if training runs to completion).
    - wandb: every epoch's train+val metrics go through ``log_wandb``
      (a no-op unless the script called ``init_wandb`` — parity with the
      reference's optional WandbWizard callback).

    Returns ``(state, hist)``; ``hist[k]`` is the per-epoch list for train
    metric / validation metric ``k``, plus ``hist["epoch_time"]``.
    """
    stopper = EarlyStopping(monitor=monitor, patience=early_stopping,
                            min_delta=min_delta, restore_best_weights=True) \
        if early_stopping and early_stopping > 0 else None
    stopped = False
    timer = timer or TrainingTimer()
    hist: Dict[str, List[float]] = {"epoch_time": []}

    def record(metrics: Dict[str, float]):
        for k, v in metrics.items():
            hist.setdefault(k, []).append(float(v))

    for epoch in range(epochs):
        timer.epoch_begin()
        batches = epoch_batches() if callable(epoch_batches) else epoch_batches
        state, train_metrics = trainer.fit_epoch(
            state, batches, steps_per_dispatch=steps_per_dispatch)
        val_metrics = eval_fn(state.params) if eval_fn is not None else {}
        timer.epoch_end()
        record(train_metrics)
        record(val_metrics)
        hist["epoch_time"].append(timer.epoch_times[-1])
        log_wandb({f"{wandb_prefix}{k}": float(v)
                   for k, v in {**train_metrics, **val_metrics}.items()},
                  step=epoch)
        if verbose_every and (epoch % verbose_every == 0
                              or epoch == epochs - 1):
            parts = [f"{k}={float(v):.4f}"
                     for k, v in {**train_metrics, **val_metrics}.items()]
            print(f"fold {fold} epoch {epoch}: " + " ".join(parts),
                  flush=True)
        if stopper is not None and stopper.update(epoch,
                                                 {**train_metrics,
                                                  **val_metrics},
                                                 state.params):
            print(f"fold {fold}: early stopping at epoch {epoch} "
                  f"(best {monitor}={stopper.sign * stopper.best:.4f})",
                  flush=True)
            stopped = True
            break

    if stopped:
        import jax.numpy as jnp
        import jax
        state = state.replace(params=jax.tree.map(
            jnp.asarray, stopper.restore(state.params)))
    return state, hist
