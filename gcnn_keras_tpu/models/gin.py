"""GIN model (parity: ``kgcnn/literature/GIN.py`` make_model / make_model_edge).

GIN: depth x (GIN conv -> GraphMLP phi); readout sums EVERY layer's node
embedding (jumping knowledge style) with its own output Dense, like the
reference implementation.
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..batch import GraphBatch
from ..layers.conv.basic import GIN as GINConv, GINE as GINEConv
from ..layers.mlp import MLP
from ..layers.norm import GraphBatchNorm
from ..layers.aggr import pool_nodes_to_graph
from .common import OptionalInputEmbedding
from .registry import update_model_kwargs

Array = jax.Array

model_default = dict(
    input_embedding={"node": {"input_dim": 95, "output_dim": 64}},
    depth=3,
    dropout=0.0,
    gin_args={"pooling_method": "sum", "epsilon_learnable": False},
    gin_mlp={"units": [64, 64], "activation": ["relu", "linear"]},
    last_mlp={"units": [64, 32], "activation": ["relu", "relu"]},
    output_embedding="graph",
    output_mlp={"units": [1], "activation": ["linear"]},
)


class GINModel(nn.Module):
    config: Dict[str, Any]
    use_edges: bool = False

    @nn.compact
    def __call__(self, batch: GraphBatch, train: bool = False) -> Dict[str, Array]:
        cfg = self.config
        x = batch.nodes.get("node_attributes", batch.nodes.get("node_number"))
        h = OptionalInputEmbedding(**cfg["input_embedding"]["node"])(x)
        h = MLP(cfg["gin_mlp"]["units"], activation=cfg["gin_mlp"]["activation"],
                name="embed_mlp")(h)
        ed = batch.edges.get("edge_attributes") if self.use_edges else None

        embeddings = [h]
        for i in range(cfg["depth"]):
            if self.use_edges and ed is not None:
                h = GINEConv(**cfg["gin_args"], name=f"gine_{i}")(batch, h, ed)
            else:
                h = GINConv(**cfg["gin_args"], name=f"gin_{i}")(batch, h)
            h = MLP(cfg["gin_mlp"]["units"], activation=cfg["gin_mlp"]["activation"],
                    name=f"gin_mlp_{i}")(h)
            h = GraphBatchNorm(name=f"bn_{i}")(h, batch.node_mask,
                                               use_running_average=not train)
            embeddings.append(h)

        if cfg["output_embedding"] == "graph":
            outs = []
            for i, e in enumerate(embeddings):
                e = e * batch.node_mask[:, None].astype(e.dtype)
                p = pool_nodes_to_graph(batch, e, mode="sum")
                p = MLP(cfg["last_mlp"]["units"], activation=cfg["last_mlp"]["activation"],
                        name=f"out_mlp_{i}")(p)
                outs.append(p)
            out = sum(outs)
            out = MLP(cfg["output_mlp"]["units"],
                      activation=cfg["output_mlp"]["activation"], name="final")(out)
        else:
            out = MLP(cfg["output_mlp"]["units"],
                      activation=cfg["output_mlp"]["activation"], name="final")(h)
        return {"output": out}


def make_model(**kwargs) -> GINModel:
    cfg = update_model_kwargs(model_default, kwargs)
    return GINModel(config=cfg)


def make_model_edge(**kwargs) -> GINModel:
    cfg = update_model_kwargs(model_default, kwargs)
    cfg.setdefault("input_embedding", {}).setdefault(
        "edge", {"input_dim": 5, "output_dim": 64})
    return GINModel(config=cfg, use_edges=True)
