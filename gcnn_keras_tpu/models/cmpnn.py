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
    edge_activation={"activation": "relu"},
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

        # reference CMPNN.py: node init on nodes, edge init on edge
        # attributes ONLY; message loop runs depth-1 times; final booster +
        # concat([m, h, h0]) -> node dense; GRU sequence readout.
        n = Dense(cfg["node_initialize"]["units"],
                  activation=cfg["node_initialize"]["activation"],
                  name="node_init")(n)
        h0_node = n
        h_e = Dense(cfg["edge_initialize"]["units"],
                    activation=cfg["edge_initialize"]["activation"],
                    name="edge_init")(ed)
        he0 = h_e
        from ..ops.activ import get_activation
        edge_act = get_activation(cfg.get("edge_activation",
                                          {"activation": "relu"})["activation"])

        for i in range(cfg["depth"] - 1):
            # communicative booster: message to node = sum * max of inbound
            agg_sum = pool_edges_to_nodes(batch, h_e, **cfg["pooling_kwargs"])
            agg_max = pool_edges_to_nodes(batch, h_e, mode="max")
            n = n + agg_sum * agg_max
            # edge update: node message at sender minus reverse edge
            msg = gather_nodes(n, batch.senders) - jnp.take(h_e, pair, axis=0)
            h_e = Dense(cfg["edge_dense"]["units"],
                        activation=cfg["edge_dense"]["activation"],
                        name=f"edge_dense_{i}")(msg)
            h_e = edge_act(h_e + he0)

        agg_sum = pool_edges_to_nodes(batch, h_e, **cfg["pooling_kwargs"])
        agg_max = pool_edges_to_nodes(batch, h_e, mode="max")
        m = agg_sum * agg_max
        n = Dense(cfg["node_dense"]["units"],
                  activation=cfg["node_dense"]["activation"], name="node_out")(
            jnp.concatenate([m, n, h0_node], axis=-1))

        if cfg["output_embedding"] == "graph":
            n = n * batch.node_mask[:, None].astype(n.dtype)
            if cfg["use_final_gru"]:
                from ..layers.conv.basic import KerasGRUSequencePooling
                out = KerasGRUSequencePooling(
                    cfg["pooling_gru"]["units"], name="gru_final")(batch, n)
            else:
                out = pool_nodes_to_graph(batch, n, **cfg["pooling_kwargs"])
            out = MLP(cfg["output_mlp"]["units"],
                      activation=cfg["output_mlp"]["activation"], name="out_mlp")(out)
        else:
            out = MLP(cfg["output_mlp"]["units"],
                      activation=cfg["output_mlp"]["activation"], name="out_mlp")(n)
        return {"output": out}


def make_model(**kwargs) -> CMPNN:
    cfg = update_model_kwargs(model_default, kwargs)
    return CMPNN(config=cfg)
