"""Row-partition conversions (parity: ``kgcnn/ops/partition.py:5-162``).

The GraphBatch design eliminates per-layer partition bookkeeping (indices
are globally shifted ONCE at batch build), but the conversion helpers are
provided for users migrating kgcnn code and for host-side tooling.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def row_splits_to_lengths(row_splits: Array) -> Array:
    return row_splits[1:] - row_splits[:-1]


def lengths_to_row_splits(lengths: Array) -> Array:
    zero = jnp.zeros((1,), dtype=lengths.dtype)
    return jnp.concatenate([zero, jnp.cumsum(lengths)])


def lengths_to_value_rowids(lengths: Array) -> Array:
    return jnp.repeat(jnp.arange(lengths.shape[0]), lengths,
                      total_repeat_length=None)


def value_rowids_to_lengths(rowids: Array, num_rows: int) -> Array:
    return jax.ops.segment_sum(jnp.ones_like(rowids), rowids, num_rows)


def row_splits_to_row_limits(row_splits: Array) -> Array:
    return row_splits[1:]


def row_splits_to_row_starts(row_splits: Array) -> Array:
    return row_splits[:-1]


_CONVERT = {
    ("row_splits", "row_length"): row_splits_to_lengths,
    ("row_length", "row_splits"): lengths_to_row_splits,
    ("row_length", "value_rowids"): lengths_to_value_rowids,
    ("row_splits", "row_limits"): row_splits_to_row_limits,
    ("row_splits", "row_starts"): row_splits_to_row_starts,
}


def change_partition_by_name(partition: Array, from_kind: str, to_kind: str) -> Array:
    """Named conversion dispatch (``ops/partition.py:5``)."""
    if from_kind == to_kind:
        return partition
    key = (from_kind, to_kind)
    if key in _CONVERT:
        return _CONVERT[key](partition)
    if from_kind == "value_rowids":
        raise ValueError("value_rowids conversion needs num_rows; use "
                         "value_rowids_to_lengths directly")
    # two-hop via row_splits
    as_splits = change_partition_by_name(partition, from_kind, "row_splits") \
        if from_kind != "row_splits" else partition
    return change_partition_by_name(as_splits, "row_splits", to_kind)


def partition_row_indexing(indices: Array, target_partition: Array,
                           index_partition: Array,
                           partition_type_target: str = "row_splits",
                           partition_type_index: str = "value_rowids") -> Array:
    """Shift per-sample indices to disjoint/global indexing — THE core trick
    of the reference (``ops/partition.py:97``): shift = target row start of
    each index's sample. In this framework ``batch_graphs`` performs this
    once on the host; this op replicates it on device."""
    if partition_type_target != "row_splits":
        target_partition = change_partition_by_name(
            target_partition, partition_type_target, "row_splits")
    if partition_type_index == "value_rowids":
        rowids = index_partition
    elif partition_type_index == "row_length":
        rowids = lengths_to_value_rowids(index_partition)
    else:
        rowids = lengths_to_value_rowids(
            row_splits_to_lengths(index_partition))
    shift = jnp.take(target_partition[:-1], rowids)
    return indices + shift.reshape(shift.shape + (1,) * (indices.ndim - 1))
