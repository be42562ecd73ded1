"""Shared model-building blocks (embedding, output heads)."""
from __future__ import annotations

from typing import Any, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..batch import GraphBatch
from ..layers.mlp import MLP
from ..layers.aggr import pool_nodes_to_graph

Array = jax.Array


class OptionalInputEmbedding(nn.Module):
    """Embedding lookup iff the input has no feature dimension
    (``kgcnn/layers/modules.py:450``): integer ``(N,)`` -> ``(N, dim)``;
    float ``(N, F)`` passes through."""

    input_dim: int = 95
    output_dim: int = 64

    @nn.compact
    def __call__(self, x: Array) -> Array:
        if jnp.issubdtype(x.dtype, jnp.integer) and x.ndim == 1:
            # keras Embedding default init is uniform(-0.05, 0.05)
            # (tf_keras embeddings_initializer='uniform'); flax's default
            # normal(stddev=1) puts ~20x more variance into the first
            # layer and measurably drags early training (same drift class
            # as the r2 lecun->glorot Dense fix, commit 72ca83a)
            return nn.Embed(
                self.input_dim, self.output_dim,
                embedding_init=lambda key, shape, dtype=jnp.float32:
                    jax.random.uniform(key, shape, dtype, -0.05, 0.05))(x)
        return x


class GraphOutputHead(nn.Module):
    """Final MLP + optional graph readout, mirroring the reference's
    ``output_embedding`` switch ('graph' | 'node')."""

    units: Union[int, Sequence[int]] = (64, 1)
    activation: Any = ("relu", "linear")
    output_embedding: str = "graph"
    pooling_method: str = "sum"
    pool_first: bool = False
    use_bias: Any = True

    @nn.compact
    def __call__(self, batch: GraphBatch, nodes: Array) -> Array:
        units = list(self.units) if isinstance(self.units, (list, tuple)) else [self.units]
        acts = list(self.activation) if isinstance(self.activation, (list, tuple)) \
            else [self.activation] * len(units)
        mlp = MLP(units, activation=acts, use_bias=self.use_bias,
                  name="output_mlp")
        if self.output_embedding == "graph":
            if self.pool_first:
                pooled = pool_nodes_to_graph(batch, nodes, mode=self.pooling_method)
                return mlp(pooled)
            out = mlp(nodes)
            out = out * batch.node_mask[:, None].astype(out.dtype)
            return pool_nodes_to_graph(batch, out, mode=self.pooling_method)
        elif self.output_embedding == "node":
            return mlp(nodes)
        raise ValueError(f"unknown output_embedding {self.output_embedding}")
