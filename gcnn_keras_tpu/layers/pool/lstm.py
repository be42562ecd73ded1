"""LSTM neighbor pooling (parity: ``kgcnn/layers/pooling.py:288``
PoolingLocalEdgesLSTM — GraphSAGE's LSTM aggregator).

TPU design: scatter edge messages into a fixed (N, max_neighbors, F)
neighbor matrix using the batch's precomputed ``edge_slot`` rank, then run
an LSTM over the neighbor axis with a validity mask — static shapes, one
``nn.scan``.
"""
from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ...batch import GraphBatch

Array = jax.Array


class _MaskedLSTMStep(nn.Module):
    units: int

    @nn.compact
    def __call__(self, carry, inp):
        x, m = inp
        new_carry, y = nn.OptimizedLSTMCell(features=self.units,
                                            name="cell")(carry, x)
        new_carry = jax.tree.map(
            lambda n, o: jnp.where(m[:, None], n, o), new_carry, carry)
        return new_carry, y


class PoolingLocalEdgesLSTM(nn.Module):
    units: int
    max_neighbors: int = 32

    @nn.compact
    def __call__(self, batch: GraphBatch, edge_values: Array) -> Array:
        assert "edge_slot" in batch.edges, \
            "needs batch_graphs with sort_edges_by_receiver=True"
        K = self.max_neighbors
        slot = jnp.minimum(batch.edges["edge_slot"], K - 1)
        N, F = batch.n_node, edge_values.shape[-1]
        nbr = jnp.zeros((N, K, F), dtype=edge_values.dtype)
        nbr = nbr.at[batch.receivers, slot].set(
            edge_values * batch.edge_mask[:, None].astype(edge_values.dtype))
        valid = jnp.zeros((N, K), dtype=bool).at[batch.receivers, slot].set(
            batch.edge_mask)

        scan = nn.scan(_MaskedLSTMStep, variable_broadcast="params",
                       split_rngs={"params": False}, in_axes=0, out_axes=0)
        step = scan(units=self.units, name="lstm")
        carry0 = nn.OptimizedLSTMCell(features=self.units, parent=None) \
            .initialize_carry(jax.random.PRNGKey(0), (N, F))
        xs = (jnp.moveaxis(nbr, 1, 0), jnp.moveaxis(valid, 1, 0))
        carry, _ = step(carry0, xs)
        return carry[1]  # final hidden state (N, units)
