"""GNN-FiLM model (parity: ``kgcnn/literature/GNNFilm.py``): per-relation
feature-wise linear modulation — gamma_r, beta_r computed from the RECEIVER
node, message = gamma * (W_r h_j) + beta."""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..batch import GraphBatch
from ..layers.aggr import gather_nodes, pool_edges_to_nodes, pool_nodes_to_graph
from ..layers.mlp import Dense, MLP, RelationalDense
from .common import OptionalInputEmbedding
from .registry import update_model_kwargs

Array = jax.Array

model_default = dict(
    input_embedding={"node": {"input_dim": 95, "output_dim": 64}},
    dense_relation_kwargs={"units": 64, "num_relations": 20},
    dense_modulation_kwargs={"units": 64, "num_relations": 20},
    activation_kwargs={"activation": "swish"},
    depth=5,
    output_embedding="graph",
    output_mlp={"units": [64, 1], "activation": ["relu", "linear"]},
)


class GNNFilm(nn.Module):
    config: Dict[str, Any]

    @nn.compact
    def __call__(self, batch: GraphBatch, train: bool = False) -> Dict[str, Array]:
        cfg = self.config
        from ..ops.activ import get_activation
        act = get_activation(cfg["activation_kwargs"]["activation"])
        x = batch.nodes.get("node_attributes", batch.nodes.get("node_number"))
        n = OptionalInputEmbedding(**cfg["input_embedding"]["node"])(x)
        rel = batch.edges.get("edge_relations")
        if rel is None:
            rel = jnp.zeros((batch.n_edge,), dtype=jnp.int32)
        else:
            rel = rel.reshape(batch.n_edge, -1)[:, 0].astype(jnp.int32)

        u = cfg["dense_relation_kwargs"]["units"]
        r = cfg["dense_relation_kwargs"]["num_relations"]
        for i in range(cfg["depth"]):
            hj = gather_nodes(n, batch.senders)
            msg = RelationalDense(u, r, activation="linear", use_bias=False,
                                  name=f"w_rel_{i}")(hj, rel)
            hi = gather_nodes(n, batch.receivers)
            gamma = RelationalDense(u, r, activation="linear",
                                    name=f"gamma_{i}")(hi, rel)
            beta = RelationalDense(u, r, activation="linear",
                                   name=f"beta_{i}")(hi, rel)
            msg = act(gamma * msg + beta)
            n = pool_edges_to_nodes(batch, msg, mode="sum")

        if cfg["output_embedding"] == "graph":
            n = n * batch.node_mask[:, None].astype(n.dtype)
            out = pool_nodes_to_graph(batch, n, mode="sum")
            out = MLP(cfg["output_mlp"]["units"],
                      activation=cfg["output_mlp"]["activation"], name="out_mlp")(out)
        else:
            out = MLP(cfg["output_mlp"]["units"],
                      activation=cfg["output_mlp"]["activation"], name="out_mlp")(n)
        return {"output": out}


def make_model(**kwargs) -> GNNFilm:
    cfg = update_model_kwargs(model_default, kwargs)
    return GNNFilm(config=cfg)
