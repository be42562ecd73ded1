"""Masked losses over padded graph batches.

Replaces the reference's ragged losses (``kgcnn/metrics/loss.py``:
RaggedMeanAbsoluteError etc.) — flat-values MAE/MSE over valid rows only.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

Array = jax.Array


def _masked_mean(err: Array, mask: Array) -> Array:
    """Mean of ``err`` over rows where ``mask`` is True (trailing feature
    dims of err are averaged too)."""
    m = mask.reshape(mask.shape + (1,) * (err.ndim - mask.ndim)).astype(err.dtype)
    trailing = 1
    for s in err.shape[mask.ndim:]:
        trailing *= s
    denom = jnp.maximum(jnp.sum(mask.astype(err.dtype)) * trailing, 1.0)
    return jnp.sum(err * m) / denom


def masked_graph_mae(pred: Array, target: Array, graph_mask: Array) -> Array:
    """MAE over valid graphs (pred/target ``(G, ...)``)."""
    return _masked_mean(jnp.abs(pred - target), graph_mask)


def masked_graph_mse(pred: Array, target: Array, graph_mask: Array) -> Array:
    return _masked_mean((pred - target) ** 2, graph_mask)


def masked_node_mae(pred: Array, target: Array, node_mask: Array) -> Array:
    """MAE over valid nodes — the RaggedMeanAbsoluteError analog for forces
    and charges (``kgcnn/metrics/loss.py:19``)."""
    return _masked_mean(jnp.abs(pred - target), node_mask)


def masked_node_mse(pred: Array, target: Array, node_mask: Array) -> Array:
    return _masked_mean((pred - target) ** 2, node_mask)


def force_loss(pred_force: Array, target_force: Array, node_mask: Array,
               kind: str = "mae") -> Array:
    if kind == "mae":
        return masked_node_mae(pred_force, target_force, node_mask)
    return masked_node_mse(pred_force, target_force, node_mask)


def masked_categorical_crossentropy(logits: Array, labels: Array,
                                    mask: Array) -> Array:
    """Softmax CE over valid rows; ``labels`` one-hot or int."""
    if labels.ndim == logits.ndim - 1:
        labels = jax.nn.one_hot(labels, logits.shape[-1], dtype=logits.dtype)
    logp = jax.nn.log_softmax(logits, axis=-1)
    ce = -jnp.sum(labels * logp, axis=-1)
    m = mask.astype(ce.dtype)
    return jnp.sum(ce * m) / jnp.maximum(jnp.sum(m), 1.0)


def masked_accuracy(logits: Array, labels: Array, mask: Array) -> Array:
    if labels.ndim == logits.ndim:
        labels = jnp.argmax(labels, axis=-1)
    correct = (jnp.argmax(logits, axis=-1) == labels).astype(jnp.float32)
    m = mask.astype(jnp.float32)
    return jnp.sum(correct * m) / jnp.maximum(jnp.sum(m), 1.0)
