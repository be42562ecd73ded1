"""R-GCN model (parity: ``kgcnn/literature/RGCN.py`` make_model): relational
graph convolution with per-relation weights (basis decomposition optional
via RelationalDense)."""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..batch import GraphBatch
from ..layers.conv.basic import RelationalGCNConv
from ..layers.mlp import MLP
from ..layers.aggr import pool_nodes_to_graph
from .common import OptionalInputEmbedding
from .registry import update_model_kwargs

Array = jax.Array

model_default = dict(
    input_embedding={"node": {"input_dim": 95, "output_dim": 64}},
    dense_relation_kwargs={"units": 64, "num_relations": 20},
    dense_kwargs={"units": 64},
    activation_kwargs={"activation": "swish"},
    depth=5,
    output_embedding="graph",
    output_mlp={"units": [64, 1], "activation": ["relu", "linear"]},
)


class RGCN(nn.Module):
    config: Dict[str, Any]

    @nn.compact
    def __call__(self, batch: GraphBatch, train: bool = False) -> Dict[str, Array]:
        cfg = self.config
        x = batch.nodes.get("node_attributes", batch.nodes.get("node_number"))
        n = OptionalInputEmbedding(**cfg["input_embedding"]["node"])(x)
        rel = batch.edges.get("edge_relations")
        if rel is None:
            rel = jnp.zeros((batch.n_edge,), dtype=jnp.int32)
        else:
            rel = rel.reshape(batch.n_edge, -1)[:, 0].astype(jnp.int32)
        ew = batch.edges.get("edge_weights")

        for i in range(cfg["depth"]):
            n = RelationalGCNConv(
                units=cfg["dense_relation_kwargs"]["units"],
                num_relations=cfg["dense_relation_kwargs"]["num_relations"],
                activation=cfg["activation_kwargs"]["activation"],
                name=f"rgcn_{i}")(batch, n, rel, ew)

        if cfg["output_embedding"] == "graph":
            n = n * batch.node_mask[:, None].astype(n.dtype)
            # reference readout is PoolingNodes() whose default is MEAN
            out = pool_nodes_to_graph(
                batch, n, **cfg.get("node_pooling_args",
                                    {"pooling_method": "mean"}))
            out = MLP(cfg["output_mlp"]["units"],
                      activation=cfg["output_mlp"]["activation"], name="out_mlp")(out)
        else:
            out = MLP(cfg["output_mlp"]["units"],
                      activation=cfg["output_mlp"]["activation"], name="out_mlp")(n)
        return {"output": out}


def make_model(**kwargs) -> RGCN:
    cfg = update_model_kwargs(model_default, kwargs)
    return RGCN(config=cfg)
