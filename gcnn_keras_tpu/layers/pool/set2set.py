"""Set2Set readout (parity: ``kgcnn/layers/pool/set2set.py:13``):
order-invariant LSTM-attention pooling over a graph's nodes (or edges).

Exact reference semantics:
- ``q*_0`` from ``init_qstar='mean'``: q0 = segment_mean(m); one attention
  round gives r0; q*_0 = [q0 || r0]. (``init_qstar='0'`` -> zeros.)
- Each of the T iterations runs a keras ``LSTM(channels)`` on the length-1
  sequence ``q*`` from a FRESH zero state (keras LSTM is stateless across
  calls), i.e. a single LSTM step with h0 = c0 = 0.
- Attention logits ``e_i = pool(m_i * q, axis=-1)`` with pool mean|sum
  (``pooling_method``), softmax per graph, ``r = sum a_i m_i``,
  ``q* = [q || r]``. Output (G, 2*channels).

Weights are stored keras-style for golden parity: ``kernel (2c, 4c)``,
``recurrent_kernel (c, 4c)``, ``bias (4c,)`` with gate order [i, f, c, o]
(the recurrent path only sees h0 = 0, so it never contributes, but the
weights exist for checkpoint compatibility).
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from ...batch import GraphBatch
from ...ops.segment import segment_softmax, segment_sum, segment_ops_by_name

Array = jax.Array


class Set2Set(nn.Module):
    channels: int
    T: int = 3
    pooling_method: str = "mean"
    init_qstar: str = "mean"

    @nn.compact
    def __call__(self, batch: GraphBatch, values: Array,
                 segment_ids: Optional[Array] = None,
                 num_segments: Optional[int] = None,
                 mask: Optional[Array] = None) -> Array:
        seg = segment_ids if segment_ids is not None else batch.graph_id
        num = num_segments if num_segments is not None else batch.n_graphs
        m_mask = mask if mask is not None else batch.node_mask
        c = self.channels
        m = values * m_mask.reshape(m_mask.shape + (1,) * (values.ndim - 1)
                                    ).astype(values.dtype)

        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (2 * c, 4 * c))
        rec_kernel = self.param("recurrent_kernel",
                                nn.initializers.orthogonal(), (c, 4 * c))
        bias = self.param("bias", nn.initializers.zeros, (4 * c,))

        def lstm_step(qstar: Array) -> Array:
            # keras LSTM one step from zero state: gates [i, f, c, o]
            zg = qstar @ kernel + bias  # recurrent part is zero (h0 = 0)
            zi, zf, zc, zo = jnp.split(zg, 4, axis=-1)
            i = jax.nn.sigmoid(zi)
            cc = i * jnp.tanh(zc)  # f * c0 = 0
            o = jax.nn.sigmoid(zo)
            return o * jnp.tanh(cc)

        def attend(q: Array) -> Array:
            qt = q[seg]
            if self.pooling_method == "mean":
                et = jnp.mean(m * qt, axis=-1, keepdims=True)
            else:
                et = jnp.sum(m * qt, axis=-1, keepdims=True)
            a = segment_softmax(et, seg, num, mask=m_mask)
            return segment_sum(m * a, seg, num)

        if self.init_qstar == "mean":
            q0 = segment_ops_by_name("mean", m, seg, num)
            r0 = attend(q0)
            qstar = jnp.concatenate([q0, r0], axis=-1)
        else:
            qstar = jnp.zeros((num, 2 * c), dtype=m.dtype)

        for _ in range(self.T):
            q = lstm_step(qstar)
            r = attend(q)
            qstar = jnp.concatenate([q, r], axis=-1)
        return qstar
