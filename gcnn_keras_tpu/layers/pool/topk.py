"""Top-K graph coarsening (parity: ``kgcnn/layers/pool/topk.py:9,215,296``).

TPU design note: the reference physically shrinks the graph (dynamic
shapes). Under jit we keep STATIC shapes and mask instead: PoolingTopK
keeps the top ceil(k*n) nodes per graph by score, zeroing the rest and
gating their edges. UnPoolingTopK restores the pre-pool mask. This is
numerically equivalent for sum-style readouts while remaining compilable.
"""
from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ...batch import GraphBatch
from ...ops.segment import segment_sum

Array = jax.Array


class PoolingTopK(nn.Module):
    """gPool (topk.py:9): score ``n . p / ||p||``, REMOVE ``round(k * n)``
    lowest-scoring nodes per graph (the reference keeps ``n - round(k n)``,
    topk.py:97-99), gate survivors by ``sigmoid(score)`` (topk.py:119).

    Masked static-shape equivalent: removed nodes stay as zeroed slots.
    An optional ``mask`` restricts the current node set (stacked pooling).
    Returns ``(gated_nodes, keep_mask, scores)``.
    """

    k: float = 0.1
    kernel_initializer: Any = None

    @nn.compact
    def __call__(self, batch: GraphBatch, nodes: Array,
                 mask: Array = None) -> Tuple[Array, Array, Array]:
        f = nodes.shape[-1]
        init = self.kernel_initializer or nn.initializers.glorot_uniform()
        p = self.param("score_kernel", init, (1, f))
        p_norm = jnp.maximum(jnp.sqrt(jnp.sum(p * p)), 1e-12)
        score = (nodes @ p[0]) / p_norm  # (N,)
        valid = batch.node_mask if mask is None else (mask & batch.node_mask)

        num_nodes = segment_sum(valid.astype(jnp.int32),
                                batch.graph_id, batch.n_graphs,
                                indices_are_sorted=True)
        n_remove = jnp.round(self.k * num_nodes)
        # ascending rank among valid same-graph nodes (ties by slot index)
        big = jnp.where(valid, score, jnp.inf)
        same_graph = batch.graph_id[:, None] == batch.graph_id[None, :]
        idx = jnp.arange(score.shape[0])
        lower = (big[None, :] < big[:, None]) | (
            (big[None, :] == big[:, None]) & (idx[None, :] < idx[:, None]))
        rank = jnp.sum(lower & same_graph & valid[None, :], axis=1)
        keep = (rank >= n_remove[batch.graph_id]) & valid

        gate = jax.nn.sigmoid(score)
        gated = nodes * gate[:, None] * keep[:, None].astype(nodes.dtype)
        return gated, keep, score


class UnPoolingTopK(nn.Module):
    """Restore node features to the pre-pool mask (topk.py:215): pooled
    features go back to kept slots, original features elsewhere."""

    def __call__(self, original_nodes: Array, pooled_nodes: Array,
                 keep_mask: Array) -> Array:
        m = keep_mask[:, None].astype(original_nodes.dtype)
        return pooled_nodes * m + original_nodes * (1 - m)


class AdjacencyPower(nn.Module):
    """Edge-weight power of adjacency (topk.py:296) via dense per-graph
    matmul on the padded adjacency — small graphs only (as in reference)."""

    n: int = 2

    def __call__(self, batch: GraphBatch, edge_weights: Array) -> Array:
        from ...batch import flat_to_padded
        G, M = batch.n_graphs, max(batch.max_nodes, 1)
        adj = jnp.zeros((G, M, M), dtype=edge_weights.dtype)
        gid = batch.edge_graph_id
        ri = jnp.minimum(batch.node_loc[batch.receivers], M - 1)
        si = jnp.minimum(batch.node_loc[batch.senders], M - 1)
        w = edge_weights.reshape(edge_weights.shape[0], -1)[:, 0]
        w = w * batch.edge_mask.astype(w.dtype)
        adj = adj.at[gid, ri, si].add(w)
        out = adj
        for _ in range(self.n - 1):
            out = jnp.einsum("gij,gjk->gik", out, adj)
        return out[gid, ri, si][:, None]
