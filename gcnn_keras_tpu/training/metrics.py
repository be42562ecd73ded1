"""Metrics (parity: ``kgcnn/metrics/metrics.py``): scaled MAE/RMSE that
multiply by the label-scaler std before reporting, NaN-tolerant
classification metrics."""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

Array = jax.Array


def scaled_mae(pred: Array, target: Array, mask: Array,
               scale: float = 1.0) -> Array:
    """ScaledMeanAbsoluteError (metrics.py:7)."""
    m = mask.reshape(mask.shape + (1,) * (pred.ndim - mask.ndim)).astype(pred.dtype)
    trailing = 1
    for s in pred.shape[mask.ndim:]:
        trailing *= s
    denom = jnp.maximum(jnp.sum(mask.astype(pred.dtype)) * trailing, 1.0)
    return jnp.sum(jnp.abs(pred - target) * m) / denom * scale


def scaled_rmse(pred: Array, target: Array, mask: Array,
                scale: float = 1.0) -> Array:
    """ScaledRootMeanSquaredError (metrics.py:101)."""
    m = mask.reshape(mask.shape + (1,) * (pred.ndim - mask.ndim)).astype(pred.dtype)
    trailing = 1
    for s in pred.shape[mask.ndim:]:
        trailing *= s
    denom = jnp.maximum(jnp.sum(mask.astype(pred.dtype)) * trailing, 1.0)
    return jnp.sqrt(jnp.sum((pred - target) ** 2 * m) / denom) * scale


def nan_tolerant_auc_inputs(pred: Array, target: Array):
    """Mask NaN labels like BinaryAccuracyNoNaN etc. (metrics.py:146-216):
    returns (pred, target, weight) with weight 0 where target is NaN."""
    w = jnp.where(jnp.isnan(target), 0.0, 1.0)
    t = jnp.where(jnp.isnan(target), 0.0, target)
    return pred, t, w


def binary_accuracy_no_nan(pred: Array, target: Array) -> Array:
    p, t, w = nan_tolerant_auc_inputs(pred, target)
    correct = ((p > 0.5) == (t > 0.5)).astype(jnp.float32) * w
    return jnp.sum(correct) / jnp.maximum(jnp.sum(w), 1.0)
