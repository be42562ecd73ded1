"""DMPNN model (parity: ``kgcnn/literature/DMPNN.py`` make_model, conv at
``kgcnn/layers/conv/dmpnn_conv.py:10,51``): directed edge messages
m_vw = (sum of edges into v) - reverse(h_wv), shared dense, residual h0."""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..batch import GraphBatch
from ..layers.aggr import gather_nodes, pool_edges_to_nodes, pool_nodes_to_graph
from ..layers.mlp import Dense, MLP
from .common import OptionalInputEmbedding
from .registry import update_model_kwargs

Array = jax.Array

model_default = dict(
    input_embedding={"node": {"input_dim": 95, "output_dim": 64},
                     "edge": {"input_dim": 5, "output_dim": 64}},
    pooling_args={"pooling_method": "sum"},
    edge_initialize={"units": 128, "use_bias": True, "activation": "relu"},
    edge_dense={"units": 128, "use_bias": True, "activation": "linear"},
    edge_activation={"activation": "relu"},
    node_dense={"units": 128, "use_bias": True, "activation": "relu"},
    depth=5,
    dropout=None,
    output_embedding="graph",
    output_mlp={"units": [64, 1], "activation": ["relu", "linear"]},
)


class DMPNN(nn.Module):
    config: Dict[str, Any]

    @nn.compact
    def __call__(self, batch: GraphBatch, train: bool = False) -> Dict[str, Array]:
        cfg = self.config
        assert "edge_pair_index" in batch.edges, \
            "DMPNN needs batch_graphs(compute_reverse_edges=True)"
        x = batch.nodes.get("node_attributes", batch.nodes.get("node_number"))
        n = OptionalInputEmbedding(**cfg["input_embedding"]["node"])(x)
        ed = batch.edges.get("edge_attributes")
        if ed is None:
            ed = jnp.zeros((batch.n_edge, 1), dtype=n.dtype)
        else:
            ed = OptionalInputEmbedding(**cfg["input_embedding"].get(
                "edge", {"input_dim": 5, "output_dim": 64}))(ed)
        pair = batch.edges["edge_pair_index"]

        h_n0 = gather_nodes(n, batch.senders)
        h0 = Dense(cfg["edge_initialize"]["units"],
                   activation=cfg["edge_initialize"]["activation"],
                   name="edge_init")(jnp.concatenate([h_n0, ed], axis=-1))

        shared = Dense(cfg["edge_dense"]["units"],
                       activation=cfg["edge_dense"]["activation"],
                       name="edge_dense_shared")
        from ..ops.activ import get_activation
        act = get_activation(cfg["edge_activation"]["activation"])

        h = h0
        for i in range(cfg["depth"]):
            # sum of all edge messages arriving at each node
            pooled = pool_edges_to_nodes(batch, h, **cfg["pooling_args"])
            # for each directed edge (v<-w): messages into w minus reverse edge
            ed_new = gather_nodes(pooled, batch.senders)
            ed_rev = jnp.take(h, pair, axis=0)
            m_vw = ed_new - ed_rev
            h = act(shared(m_vw) + h0)

        mv = pool_edges_to_nodes(batch, h, **cfg["pooling_args"])
        hv = Dense(cfg["node_dense"]["units"],
                   activation=cfg["node_dense"]["activation"],
                   name="node_dense")(jnp.concatenate([mv, n], axis=-1))

        if cfg["output_embedding"] == "graph":
            hv = hv * batch.node_mask[:, None].astype(hv.dtype)
            out = pool_nodes_to_graph(batch, hv, mode="sum")
            out = MLP(cfg["output_mlp"]["units"],
                      activation=cfg["output_mlp"]["activation"], name="out_mlp")(out)
        else:
            out = MLP(cfg["output_mlp"]["units"],
                      activation=cfg["output_mlp"]["activation"], name="out_mlp")(hv)
        return {"output": out}


def make_model(**kwargs) -> DMPNN:
    cfg = update_model_kwargs(model_default, kwargs)
    return DMPNN(config=cfg)
