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
    k: float = 0.1
    kernel_initializer: Any = None

    @nn.compact
    def __call__(self, batch: GraphBatch, nodes: Array
                 ) -> Tuple[Array, Array, Array]:
        """Returns (gated_nodes, keep_mask, scores)."""
        f = nodes.shape[-1]
        p = self.param("score_kernel", nn.initializers.lecun_normal(), (f, 1))
        p_norm = p / jnp.maximum(jnp.linalg.norm(p), 1e-12)
        score = (nodes @ p_norm)[:, 0]  # (N,)
        score = jnp.where(batch.node_mask, score, -jnp.inf)

        # per-graph rank of each node by score (descending)
        num_nodes = segment_sum(batch.node_mask.astype(jnp.int32),
                                batch.graph_id, batch.n_graphs,
                                indices_are_sorted=True)
        keep_counts = jnp.ceil(self.k * num_nodes).astype(jnp.int32)
        # rank within graph: count of same-graph nodes with strictly higher score
        same_graph = batch.graph_id[:, None] == batch.graph_id[None, :]
        higher = (score[None, :] > score[:, None]) & same_graph
        rank = jnp.sum(higher, axis=1)
        keep = (rank < keep_counts[batch.graph_id]) & batch.node_mask

        gate = jnp.tanh(score)
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
