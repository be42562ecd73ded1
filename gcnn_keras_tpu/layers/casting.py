"""Tensor-format casts (parity surface for ``kgcnn/layers/casting.py``):
flat <-> per-graph padded(+mask), edge list -> dense or COO adjacency."""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..batch import GraphBatch, flat_to_padded, padded_to_flat

Array = jax.Array


def cast_flat_to_padded(batch: GraphBatch, values: Array,
                        fill: float = 0.0) -> Tuple[Array, Array]:
    """(N, F) -> ((G, M, F), (G, M) mask) — ChangeTensorType ragged->mask
    (casting.py:64)."""
    padded = flat_to_padded(values, batch, fill=fill)
    mask = flat_to_padded(batch.node_mask.astype(jnp.float32), batch) > 0
    return padded, mask


def cast_padded_to_flat(batch: GraphBatch, padded: Array) -> Array:
    return padded_to_flat(padded, batch)


def cast_edges_to_dense_adjacency(batch: GraphBatch,
                                  edge_values: Array = None) -> Array:
    """Edge list -> (G, M, M) dense adjacency (casting.py:106)."""
    G, M = batch.n_graphs, max(batch.max_nodes, 1)
    w = edge_values.reshape(batch.n_edge, -1)[:, 0] if edge_values is not None \
        else batch.edge_mask.astype(jnp.float32)
    w = w * batch.edge_mask.astype(w.dtype)
    adj = jnp.zeros((G, M, M), dtype=w.dtype)
    ri = jnp.minimum(batch.node_loc[batch.receivers], M - 1)
    si = jnp.minimum(batch.node_loc[batch.senders], M - 1)
    return adj.at[batch.edge_graph_id, ri, si].add(w)


def cast_edges_to_coo(batch: GraphBatch) -> Tuple[Array, Array, Array]:
    """Disjoint COO adjacency (casting.py:200): (receivers, senders, mask)."""
    return batch.receivers, batch.senders, batch.edge_mask
