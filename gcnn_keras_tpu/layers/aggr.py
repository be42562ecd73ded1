"""Gather and aggregation primitives over flat disjoint batches.

TPU-native replacement for the reference's gather/pooling layer pair
(``kgcnn/layers/gather.py`` + ``kgcnn/layers/pooling.py``). These are plain
functions, not stateful modules — the reference wrapped them in Keras layers
only to manage ragged partitions, which the GraphBatch format eliminates.

Conventions:
- messages flow sender -> receiver;
- edges are pre-sorted by receiver (``indices_are_sorted=True`` fast path);
- padding edges target dead padding nodes, so no masking is needed for sums
  (padding edge features are zero); ops with non-zero identity (max/min,
  softmax) take the mask explicitly.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..batch import GraphBatch, sender_node_table
from ..ops.segment import (
    segment_ops_by_name, segment_softmax,
)

Array = jax.Array


def gather_nodes(values: Array, indices: Array) -> Array:
    """Edge-wise gather: ``values[(N, ...)][indices (E,)] -> (E, ...)``.

    The reference's GatherNodes/GatherEmbeddingSelection
    (``kgcnn/layers/gather.py:69-100``) — here a single ``take`` because
    indices are already disjoint/global.
    """
    return jnp.take(values, indices, axis=0)


def gather_sender_nodes(batch: GraphBatch, values: Array) -> Array:
    """Sender-side gather whose backward scatter runs as the SORTED Pallas
    segment-sum via the build-time ``sender_perm`` (falls back to a plain
    take off-TPU / on small batches). Drop-in for
    ``gather_nodes(values, batch.senders)`` in hot message paths.

    On a shard of an edge-partitioned giant graph (``batch.part_axis``
    set), the gather reads from the halo-exchanged node table instead —
    this single routing point is what lets the unmodified model zoo run
    partitioned."""
    if batch.part_axis is not None:
        return jnp.take(sender_node_table(batch, values), batch.senders,
                        axis=0)
    perm = batch.edges.get("sender_perm")
    if perm is None:
        return jnp.take(values, batch.senders, axis=0)
    from ..ops.pallas.fused_aggregate import gather_with_sorted_transpose
    return gather_with_sorted_transpose(values, batch.senders, perm)


def gather_receiver_nodes(batch: GraphBatch, values: Array) -> Array:
    """Receiver-side gather; receivers are ALREADY sorted (batching
    invariant), so its backward scatter needs no permutation."""
    from ..ops.pallas.fused_aggregate import gather_with_sorted_transpose
    return gather_with_sorted_transpose(values, batch.receivers, None)


def gather_state(state: Array, batch: GraphBatch) -> Array:
    """Broadcast per-graph state ``(G, F)`` to nodes ``(N, F)``
    (``kgcnn/layers/gather.py:323`` GatherState)."""
    return jnp.take(state, batch.graph_id, axis=0)


def pool_edges_to_nodes(batch: GraphBatch, edge_values: Array,
                        mode: str = "sum",
                        pooling_method: Optional[str] = None) -> Array:
    """Aggregate edge messages onto receiving nodes — THE aggregation kernel
    (``kgcnn/layers/pooling.py:11`` PoolingLocalEdges).

    ``edge_values``: ``(E, ...)``. Returns ``(N, ...)``. Padding edges point
    at dead padding nodes, so their contributions never reach real nodes.
    ``pooling_method`` is an alias for ``mode`` (reference config names).
    """
    mode = pooling_method or mode
    if batch.part_axis is not None:
        # partitioned shards have NO dead node for padding edges (every
        # local slot may be real), so padding messages are masked here —
        # the one central aggregation point all models flow through.
        if mode != "sum":
            raise NotImplementedError(
                f"partitioned graphs only support sum aggregation, got {mode}")
        edge_values = edge_values * _bcast(
            batch.edge_mask, edge_values).astype(edge_values.dtype)
    return segment_ops_by_name(
        mode, edge_values, batch.receivers, batch.n_node,
        indices_are_sorted=True)


def gather_mul_pool_edges(batch: GraphBatch, nodes: Array,
                          edge_filter: Array, mode: str = "sum",
                          fused: bool = False) -> Array:
    """``out[r] = sum_e nodes[senders[e]] * edge_filter[e]`` — the cfconv
    hot chain.

    ``fused=True`` dispatches to the AD-CLOSED fused Pallas kernel
    (``ops/pallas/bilinear.py``): a ``gms`` primitive whose bilinear JVP
    keeps primal+tangent applications on the fused kernel and whose
    transpose rules emit the proven unfused sorted-segment-sum backward —
    differentiable to ANY order (grad-of-grad force training works, unlike
    the older custom_vjp variant ``fused="vjp"``).

    Measured v5e, 512-mol SchNet bench shapes (PERF.md r2): MD energy+force
    inference 4.93 ms fused vs 5.12 ms unfused (use fused=True for MD);
    TRAIN step 13.9 ms fused vs 11.1 ms unfused (keep the default False for
    training — the kernel's fixed per-block cost beats its byte savings
    once the step runs 4 AD traversals)."""
    if batch.part_axis is not None:
        xj = jnp.take(sender_node_table(batch, nodes), batch.senders, axis=0)
        return pool_edges_to_nodes(batch, xj * edge_filter, mode=mode)
    perm = batch.edges.get("sender_perm")
    if fused and mode == "sum":
        if fused != "vjp" and perm is not None and nodes.ndim == 2 \
                and edge_filter.ndim == 2 and batch.max_nodes is not None:
            from ..ops.pallas.bilinear import bilinear_gather_mul_segsum
            return bilinear_gather_mul_segsum(
                nodes, edge_filter, batch.senders, batch.receivers, perm,
                batch.max_nodes)
        from ..ops.pallas.fused_aggregate import gather_mul_segsum_auto
        return gather_mul_segsum_auto(
            nodes, edge_filter, batch.senders, batch.receivers,
            batch.n_node, batch.max_nodes, indices_are_sorted=True,
            sender_perm=perm)
    if perm is not None:
        # unfused path, but with the gather's TRANSPOSE (the backward's
        # scatter-by-sender) routed through the sorted Pallas segment-sum
        from ..ops.pallas.fused_aggregate import gather_with_sorted_transpose
        xj = gather_with_sorted_transpose(nodes, batch.senders, perm)
        return pool_edges_to_nodes(batch, xj * edge_filter, mode=mode)
    xj = gather_nodes(nodes, batch.senders)
    return pool_edges_to_nodes(batch, xj * edge_filter, mode=mode)


def pool_weighted_edges_to_nodes(batch: GraphBatch, edge_values: Array,
                                 edge_weights: Array, mode: str = "sum",
                                 normalize: bool = False) -> Array:
    """Weighted aggregation (``kgcnn/layers/pooling.py:92``
    PoolingWeightedLocalEdges)."""
    w = edge_weights
    if w.ndim == edge_values.ndim - 1:
        w = w[..., None]
    out = segment_ops_by_name(mode, edge_values * w, batch.receivers,
                              batch.n_node, indices_are_sorted=True)
    if normalize:
        norm = segment_ops_by_name("sum", w, batch.receivers, batch.n_node,
                                   indices_are_sorted=True)
        out = out / jnp.maximum(norm, 1e-12)
    return out


def pool_edges_to_nodes_attention(batch: GraphBatch, edge_values: Array,
                                  attention_logits: Array) -> Array:
    """Attention-coefficient aggregation (``kgcnn/layers/pooling.py:464``
    PoolingLocalEdgesAttention): softmax of logits per receiving node, then
    weighted sum of edge values."""
    coeff = segment_softmax(attention_logits, batch.receivers, batch.n_node,
                            mask=batch.edge_mask)
    return segment_ops_by_name("sum", edge_values * coeff, batch.receivers,
                               batch.n_node, indices_are_sorted=True)


def relational_pool_edges_to_nodes(batch: GraphBatch, edge_values: Array,
                                   edge_relations: Array, num_relations: int,
                                   mode: str = "sum") -> Array:
    """Per-relation aggregation -> ``(N, num_relations, F)``
    (``kgcnn/layers/pooling.py:603`` RelationalPoolingLocalEdges, used by
    ACSF to sum per neighbor element).

    Implemented as a single segment op over the combined id
    ``receiver * num_relations + relation`` — no (N, R, F) scatter loop.
    """
    combined = batch.receivers * num_relations + edge_relations
    out = segment_ops_by_name(mode, edge_values, combined,
                              batch.n_node * num_relations)
    return out.reshape((batch.n_node, num_relations) + edge_values.shape[1:])


def pool_nodes_to_graph(batch: GraphBatch, node_values: Array,
                        mode: str = "sum",
                        pooling_method: Optional[str] = None) -> Array:
    """Whole-graph readout ``(N, ...) -> (G, ...)``
    (``kgcnn/layers/pooling.py:186`` PoolingNodes).

    Padding nodes all live in the padding graph slot, so no masking is
    needed for any reduction mode. ``pooling_method`` is accepted as an
    alias for ``mode`` (reference config names).

    On a shard of an edge-partitioned giant graph the result is the GLOBAL
    per-graph pooled value (psum over the mesh axis, replicated on every
    shard) — necessary because readout MLPs applied after pooling are
    nonlinear, so partial pools cannot be combined after the fact.

    AD WARNING for the partitioned case: differentiating the replicated
    model output directly D-fold-counts every pre-pooling path (psum is
    self-transpose, and every shard seeds a cotangent on its own copy).
    The consistent SPMD recipe — used by ``parallel/partitioned.py`` and
    verified against the single-device oracle — is to differentiate
    ``output / n_shards``; then forces AND psum'd parameter gradients both
    come out exact, including through replicated post-pooling readout MLPs.
    """
    mode = pooling_method or mode
    out = segment_ops_by_name(mode, node_values, batch.graph_id,
                              batch.n_graphs, indices_are_sorted=True)
    if batch.part_axis is not None:
        if mode != "sum":
            raise NotImplementedError(
                f"partitioned graphs only support sum readout, got {mode}")
        out = jax.lax.psum(out, batch.part_axis)
    return out


def pool_nodes_to_graph_attention(batch: GraphBatch, node_values: Array,
                                  attention_logits: Array) -> Array:
    """Graph readout with per-node attention (PoolingEmbeddingAttention,
    ``kgcnn/layers/pooling.py:550``)."""
    coeff = segment_softmax(attention_logits, batch.graph_id, batch.n_graphs,
                            mask=batch.node_mask)
    return segment_ops_by_name("sum", node_values * coeff, batch.graph_id,
                               batch.n_graphs, indices_are_sorted=True)


def pool_edges_to_graph(batch: GraphBatch, edge_values: Array,
                        mode: str = "sum") -> Array:
    """Readout over edges ``(E, ...) -> (G, ...)`` (PoolingGlobalEdges)."""
    return segment_ops_by_name(mode, edge_values, batch.edge_graph_id,
                               batch.n_graphs)


def _bcast(mask: Array, ref: Array) -> Array:
    return mask.reshape(mask.shape + (1,) * (ref.ndim - mask.ndim))
