"""Message-passing template (``kgcnn/layers/message.py:9`` MessagePassingBase).

Subclass and override ``message_function`` / ``update_nodes``; aggregation
defaults to the sorted segment-sum over receivers.
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import flax.linen as nn

from ..batch import GraphBatch
from .aggr import gather_nodes, pool_edges_to_nodes

Array = jax.Array


class MessagePassing(nn.Module):
    """Template: gather endpoint features -> message -> aggregate -> update."""

    pooling_method: str = "sum"

    def message_function(self, x_i: Array, x_j: Array,
                         edge_attr: Optional[Array]) -> Array:
        raise NotImplementedError

    def update_nodes(self, nodes: Array, aggregated: Array) -> Array:
        raise NotImplementedError

    def __call__(self, batch: GraphBatch, nodes: Array,
                 edge_attr: Optional[Array] = None) -> Array:
        x_i = gather_nodes(nodes, batch.receivers)
        x_j = gather_nodes(nodes, batch.senders)
        msg = self.message_function(x_i, x_j, edge_attr)
        agg = pool_edges_to_nodes(batch, msg, mode=self.pooling_method)
        return self.update_nodes(nodes, agg)
