"""GCN convolution (``kgcnn/layers/conv/gcn_conv.py:10``).

h_i' = act( sum_j w_ij * (W h_j) ) with symmetric-normalized edge weights
(precomputed at preprocessing like the reference's
NormalizeEdgeWeightsSymmetric).
"""
from __future__ import annotations

from typing import Any

import jax
import flax.linen as nn

from ...batch import GraphBatch
from ..aggr import (gather_nodes, gather_sender_nodes,
                    pool_weighted_edges_to_nodes)
from ..mlp import Dense

Array = jax.Array


class GCNConv(nn.Module):
    units: int
    activation: Any = "relu"
    use_bias: bool = True
    pooling_method: str = "sum"
    normalize_by_weights: bool = False

    @nn.compact
    def __call__(self, batch: GraphBatch, nodes: Array,
                 edge_weights: Array) -> Array:
        h = Dense(self.units, activation="linear", use_bias=self.use_bias)(nodes)
        hj = gather_sender_nodes(batch, h)
        agg = pool_weighted_edges_to_nodes(
            batch, hj, edge_weights, mode=self.pooling_method,
            normalize=self.normalize_by_weights)
        from ...ops.activ import get_activation
        return get_activation(self.activation)(agg)
