"""CMPNN — communicative message passing (parity:
``kgcnn/literature/CMPNN.py``): DMPNN-style directed edge messages with a
node-edge "communicative" booster (max + sum aggregation) and GRU final
update."""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..batch import GraphBatch
from ..layers.aggr import gather_nodes, pool_edges_to_nodes, pool_nodes_to_graph
from ..layers.conv.basic import GRUUpdate
from ..layers.mlp import Dense, MLP
from .common import OptionalInputEmbedding
from .registry import update_model_kwargs

Array = jax.Array

model_default = dict(
    input_embedding={"node": {"input_dim": 95, "output_dim": 64},
                     "edge": {"input_dim": 5, "output_dim": 64}},
    node_initialize={"units": 300, "activation": "relu"},
    edge_initialize={"units": 300, "activation": "relu"},
    edge_dense={"units": 300, "activation": "linear"},
    node_dense={"units": 300, "activation": "linear"},
    verbose=10, depth=5,
    dropout=None,
    use_final_gru=True,
    pooling_gru={"units": 300},
    pooling_kwargs={"pooling_method": "sum"},
    output_embedding="graph",
    output_mlp={"units": [300, 100, 1], "activation": ["relu", "relu", "linear"]},
)


class CMPNN(nn.Module):
    config: Dict[str, Any]

    @nn.compact
    def __call__(self, batch: GraphBatch, train: bool = False) -> Dict[str, Array]:
        cfg = self.config
        assert "edge_pair_index" in batch.edges, \
            "CMPNN needs batch_graphs(compute_reverse_edges=True)"
        x = batch.nodes.get("node_attributes", batch.nodes.get("node_number"))
        n = OptionalInputEmbedding(**cfg["input_embedding"]["node"])(x)
        ed = batch.edges.get("edge_attributes")
        if ed is None:
            ed = jnp.zeros((batch.n_edge, 1), dtype=n.dtype)
        pair = batch.edges["edge_pair_index"]

        n = Dense(cfg["node_initialize"]["units"],
                  activation=cfg["node_initialize"]["activation"],
                  name="node_init")(n)
        h_e = Dense(cfg["edge_initialize"]["units"],
                    activation=cfg["edge_initialize"]["activation"],
                    name="edge_init")(
            jnp.concatenate([gather_nodes(n, batch.senders), ed], axis=-1))
        h0 = h_e

        for i in range(cfg["depth"]):
            # communicative booster: message to node = sum + max of inbound edges
            agg_sum = pool_edges_to_nodes(batch, h_e, mode="sum")
            agg_max = pool_edges_to_nodes(batch, h_e, mode="max")
            n = n + agg_sum * agg_max if n.shape == agg_sum.shape else agg_sum * agg_max
            # edge update: node message at sender minus reverse edge
            msg = gather_nodes(n, batch.senders) - jnp.take(h_e, pair, axis=0)
            h_e = Dense(cfg["edge_dense"]["units"],
                        activation=cfg["edge_dense"]["activation"],
                        name=f"edge_dense_{i}")(msg)
            h_e = jax.nn.relu(h_e + h0)

        agg = pool_edges_to_nodes(batch, h_e, **cfg["pooling_kwargs"])
        n = Dense(cfg["node_dense"]["units"],
                  activation=cfg["node_dense"]["activation"], name="node_out")(
            jnp.concatenate([n, agg], axis=-1))
        if cfg["use_final_gru"]:
            u = cfg["pooling_gru"]["units"]
            n_in = Dense(u, activation="linear", name="gru_proj")(n)
            n = GRUUpdate(u, name="gru_final")(n_in, n_in)

        if cfg["output_embedding"] == "graph":
            n = n * batch.node_mask[:, None].astype(n.dtype)
            out = pool_nodes_to_graph(batch, n, mode="sum")
            out = MLP(cfg["output_mlp"]["units"],
                      activation=cfg["output_mlp"]["activation"], name="out_mlp")(out)
        else:
            out = MLP(cfg["output_mlp"]["units"],
                      activation=cfg["output_mlp"]["activation"], name="out_mlp")(n)
        return {"output": out}


def make_model(**kwargs) -> CMPNN:
    cfg = update_model_kwargs(model_default, kwargs)
    return CMPNN(config=cfg)
