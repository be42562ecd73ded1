"""Dense-block (per-molecule padded) message-passing helpers.

TPU-first alternative execution mode for batches of SMALL graphs (the
molecular-potential regime: many molecules of ~10-50 atoms). Node features
live as ``(G, M, F)`` padded blocks and messages flow over a dense
``(G, M, M)`` adjacency mask, so

- every per-edge filter MLP becomes one big ``(G*M*M, K) @ (K, U)`` MXU
  matmul,
- every aggregation becomes a fully-fusable masked multiply + reduce over
  the neighbor axis,
- there are NO gathers, NO scatters and NO per-kernel dispatch in the hot
  loop — the serialized gather/scatter chain instances PERF.md (r2/r3)
  identifies as the train-step bottleneck disappear entirely.

The price is ~M^2 / E_avg more raw elementwise work (pairs instead of
edges), which is the right trade exactly when graphs are small and dense-ish
(M^2 within ~2-6x of E_avg). The flat path remains the default and the only
path for giant/partitioned graphs.

No reference counterpart: kgcnn always executes ragged gather/scatter
chains (``kgcnn/layers/gather.py:286``, ``kgcnn/layers/pooling.py:37-79``);
this mode is a pure TPU redesign.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..batch import GraphBatch, flat_to_padded

Array = jax.Array


def dense_adjacency(batch: GraphBatch) -> Array:
    """Scatter the edge list into a dense ``(G, M, M)`` float mask.

    ``adj[g, i, j] = 1`` iff the batch contains a (valid) edge j -> i inside
    graph ``g`` (i receives, j sends — the reference's ``edge_indices``
    convention, kgcnn/layers/gather.py:286). Multi-edges collapse to 1, so
    dense-block mode requires simple graphs (range graphs without periodic
    images satisfy this; ``models/schnet.py`` enforces it).

    One O(E) scatter per traced forward; integer-derived, so no gradients
    flow through it.
    """
    G, M = batch.n_graphs, max(batch.max_nodes, 1)
    ei = jnp.minimum(batch.node_loc[batch.receivers], M)
    ej = jnp.minimum(batch.node_loc[batch.senders], M)
    eg = batch.graph_id[batch.receivers]
    # push invalid (padding) edges into the scratch row/col that is sliced off
    ei = jnp.where(batch.edge_mask, ei, M)
    adj = jnp.zeros((G, M + 1, M + 1), dtype=jnp.float32)
    adj = adj.at[eg, ei, ej].set(1.0)
    return jax.lax.stop_gradient(adj[:, :M, :M])


def dense_pair_distances(coordinates: Array, batch: GraphBatch,
                         adj: Array) -> Array:
    """All-pairs intra-molecule distances ``(G, M, M)`` from FLAT ``(N, 3)``
    coordinates (differentiable — forces flow through the padding gather's
    transpose, one O(N) scatter per reverse pass).

    Entries with ``adj == 0`` are computed against a safe dummy (sqrt(1)) so
    no NaN gradients leak from coincident padding rows; callers must mask by
    ``adj`` anyway.
    """
    pos = flat_to_padded(coordinates, batch)  # (G, M, 3)
    diff = pos[:, :, None, :] - pos[:, None, :, :]
    d2 = jnp.sum(diff * diff, axis=-1)
    safe = jnp.where(adj > 0, d2, 1.0)
    return jnp.sqrt(safe)


def padded_node_mask(batch: GraphBatch) -> Array:
    """Valid-node mask in padded layout ``(G, M)`` float32."""
    return flat_to_padded(batch.node_mask.astype(jnp.float32), batch)
