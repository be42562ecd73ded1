"""GraphSAGE model (parity: ``kgcnn/literature/GraphSAGE.py:95-140``):
depth x (gather -> [concat edge] -> edge MLP -> pool -> concat node ->
node MLP -> LayerNorm)."""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..batch import GraphBatch
from ..layers.aggr import gather_nodes, pool_edges_to_nodes, pool_nodes_to_graph
from ..layers.mlp import MLP
from ..layers.norm import GraphLayerNorm
from .common import OptionalInputEmbedding
from .registry import update_model_kwargs

Array = jax.Array

model_default = dict(
    input_embedding={"node": {"input_dim": 95, "output_dim": 64},
                     "edge": {"input_dim": 5, "output_dim": 32}},
    node_mlp_args={"units": [64, 32], "activation": ["relu", "linear"]},
    edge_mlp_args={"units": 64, "activation": "relu"},
    pooling_args={"pooling_method": "mean"},
    pooling_nodes_args={"pooling_method": "mean"},
    gather_args={},
    concat_args={},
    use_edge_features=True,
    depth=3,
    output_embedding="graph",
    output_mlp={"units": [32, 16, 1], "activation": ["relu", "relu", "linear"]},
)


class GraphSAGE(nn.Module):
    config: Dict[str, Any]

    @nn.compact
    def __call__(self, batch: GraphBatch, train: bool = False) -> Dict[str, Array]:
        cfg = self.config
        x = batch.nodes.get("node_attributes", batch.nodes.get("node_number"))
        n = OptionalInputEmbedding(**cfg["input_embedding"]["node"])(x)
        ed = batch.edges.get("edge_attributes")
        if ed is not None:
            ed = OptionalInputEmbedding(**cfg["input_embedding"].get(
                "edge", {"input_dim": 5, "output_dim": 32}))(ed)

        for i in range(cfg["depth"]):
            eu = gather_nodes(n, batch.senders)
            if cfg["use_edge_features"] and ed is not None:
                eu = jnp.concatenate([eu, ed], axis=-1)
            eu = MLP(cfg["edge_mlp_args"]["units"],
                     activation=cfg["edge_mlp_args"]["activation"],
                     name=f"edge_mlp_{i}")(eu)
            nu = pool_edges_to_nodes(batch, eu, **cfg["pooling_args"])
            nu = jnp.concatenate([n, nu], axis=-1)
            n = MLP(cfg["node_mlp_args"]["units"],
                    activation=cfg["node_mlp_args"]["activation"],
                    name=f"node_mlp_{i}")(nu)
            n = GraphLayerNorm(name=f"norm_{i}")(n)

        if cfg["output_embedding"] == "graph":
            n = n * batch.node_mask[:, None].astype(n.dtype)
            out = pool_nodes_to_graph(batch, n, **cfg["pooling_nodes_args"])
            out = MLP(cfg["output_mlp"]["units"],
                      activation=cfg["output_mlp"]["activation"], name="out_mlp")(out)
        else:
            out = MLP(cfg["output_mlp"]["units"],
                      activation=cfg["output_mlp"]["activation"], name="out_mlp")(n)
        return {"output": out}


def make_model(**kwargs) -> GraphSAGE:
    cfg = update_model_kwargs(model_default, kwargs)
    return GraphSAGE(config=cfg)
