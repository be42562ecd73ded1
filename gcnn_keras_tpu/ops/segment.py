"""Segment reductions with static ``num_segments`` — the aggregation kernels.

TPU-native replacement for the reference's sort+segment machinery
(``kgcnn/ops/segment.py:5-52`` and ``kgcnn/layers/pooling.py:37-79``): the
reference argsorts receiver ids inside every layer call and then applies
``tf.math.segment_*``; here edges are sorted once at batch build and all
reductions are unsorted-safe scatter-adds that XLA lowers to efficient TPU
code with fully static shapes.
"""
from __future__ import annotations


from typing import Optional

import jax
import jax.numpy as jnp

Array = jax.Array


import os

# Pallas fast path for sorted sums on TPU (ops/pallas/segment_sum.py):
# one-hot matmuls on the MXU instead of XLA's serialized scatter-add;
# measured 1.7-1.9x over XLA at E>=32k on v5e with exact f32 results.
USE_PALLAS = os.environ.get("GCNN_TPU_PALLAS", "1") != "0"


def segment_sum(data: Array, segment_ids: Array, num_segments: int,
                indices_are_sorted: bool = False) -> Array:
    flat_f = 1
    for s in data.shape[1:]:
        flat_f *= s
    if (USE_PALLAS and indices_are_sorted and data.ndim >= 2
            and jnp.issubdtype(data.dtype, jnp.floating)
            and jax.default_backend() == "tpu"
            and data.shape[0] >= 16384 and flat_f >= 64):
        from .pallas.segment_sum import sorted_segment_sum_pallas
        flat = data.reshape(data.shape[0], -1)
        out = sorted_segment_sum_pallas(flat, segment_ids.astype(jnp.int32),
                                        num_segments)
        return out.reshape((num_segments,) + data.shape[1:])
    return jax.ops.segment_sum(data, segment_ids, num_segments,
                               indices_are_sorted=indices_are_sorted)


def segment_mean(data: Array, segment_ids: Array, num_segments: int,
                 indices_are_sorted: bool = False) -> Array:
    s = jax.ops.segment_sum(data, segment_ids, num_segments,
                            indices_are_sorted=indices_are_sorted)
    ones = jnp.ones(data.shape[:1], dtype=data.dtype)
    cnt = jax.ops.segment_sum(ones, segment_ids, num_segments,
                              indices_are_sorted=indices_are_sorted)
    cnt = jnp.maximum(cnt, 1)
    return s / cnt.reshape(cnt.shape + (1,) * (s.ndim - 1))


def segment_max(data: Array, segment_ids: Array, num_segments: int,
                indices_are_sorted: bool = False) -> Array:
    out = jax.ops.segment_max(data, segment_ids, num_segments,
                              indices_are_sorted=indices_are_sorted)
    # Empty segments come back as -inf; zero them like the reference's
    # scatter_nd fill of unconnected nodes (kgcnn/layers/pooling.py:75).
    return jnp.where(jnp.isfinite(out), out, 0)


def segment_min(data: Array, segment_ids: Array, num_segments: int,
                indices_are_sorted: bool = False) -> Array:
    out = jax.ops.segment_min(data, segment_ids, num_segments,
                              indices_are_sorted=indices_are_sorted)
    return jnp.where(jnp.isfinite(out), out, 0)


_SEGMENT_OPS = {
    "sum": segment_sum,
    "segment_sum": segment_sum,
    "mean": segment_mean,
    "segment_mean": segment_mean,
    "max": segment_max,
    "segment_max": segment_max,
    "min": segment_min,
    "segment_min": segment_min,
}


def segment_ops_by_name(name: str, data: Array, segment_ids: Array,
                        num_segments: int, indices_are_sorted: bool = False) -> Array:
    """Dispatch like the reference's ``segment_ops_by_name`` (ops/segment.py:5)."""
    try:
        op = _SEGMENT_OPS[name]
    except KeyError:
        raise ValueError(f"Unknown segment op {name!r}; choose from {sorted(_SEGMENT_OPS)}")
    return op(data, segment_ids, num_segments, indices_are_sorted)


def segment_softmax(data: Array, segment_ids: Array, num_segments: int,
                    mask: Optional[Array] = None) -> Array:
    """Numerically-stable softmax within segments (ops/segment.py:28).

    ``data`` is ``(E, ...)``; softmax is per segment along axis 0. Masked
    (padding) entries get probability 0.
    """
    if mask is not None:
        neg = jnp.asarray(-1e9, dtype=data.dtype)
        data = jnp.where(mask.reshape(mask.shape + (1,) * (data.ndim - 1)), data, neg)
    seg_max = jax.ops.segment_max(data, segment_ids, num_segments)
    seg_max = jnp.where(jnp.isfinite(seg_max), seg_max, 0)
    ex = jnp.exp(data - seg_max[segment_ids])
    if mask is not None:
        ex = ex * mask.reshape(mask.shape + (1,) * (ex.ndim - 1)).astype(ex.dtype)
    denom = jax.ops.segment_sum(ex, segment_ids, num_segments)
    denom = jnp.maximum(denom, 1e-20)
    return ex / denom[segment_ids]
