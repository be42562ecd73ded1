"""Set2Set readout (parity: ``kgcnn/layers/pool/set2set.py:13``):
order-invariant LSTM-attention pooling over a graph's nodes (or edges).

q_t = LSTM(q*_{t-1}); a_i = softmax(x_i . q_t) within graph;
r_t = sum a_i x_i; q*_t = [q_t || r_t]. Output (G, 2F).
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn

from ...batch import GraphBatch
from ...ops.segment import segment_softmax, segment_sum

Array = jax.Array


class Set2Set(nn.Module):
    channels: int
    T: int = 3
    pooling_method: str = "sum"

    @nn.compact
    def __call__(self, batch: GraphBatch, values: Array,
                 segment_ids: Array = None, num_segments: int = None,
                 mask: Array = None) -> Array:
        seg = segment_ids if segment_ids is not None else batch.graph_id
        num = num_segments if num_segments is not None else batch.n_graphs
        m = mask if mask is not None else batch.node_mask
        f = self.channels
        x = nn.Dense(f, name="proj")(values)

        cell = nn.LSTMCell(features=f, name="lstm")
        carry = cell.initialize_carry(jax.random.PRNGKey(0), (num, f))
        qstar = jnp.zeros((num, 2 * f), dtype=x.dtype)
        for _ in range(self.T):
            carry, q = cell(carry, qstar)
            logits = jnp.sum(x * q[seg], axis=-1, keepdims=True)
            a = segment_softmax(logits, seg, num, mask=m)
            r = segment_sum(x * a, seg, num)
            qstar = jnp.concatenate([q, r], axis=-1)
        return qstar
