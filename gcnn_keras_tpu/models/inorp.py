"""INorp — interaction network with residual updates (parity:
``kgcnn/literature/INorp.py`` make_model): edge MLP on [n_i, n_j, e],
node MLP on [n, pooled, state]."""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..batch import GraphBatch
from ..layers.aggr import (
    gather_nodes, gather_state, pool_edges_to_nodes, pool_nodes_to_graph,
)
from ..layers.mlp import Dense, MLP
from .common import OptionalInputEmbedding
from .registry import update_model_kwargs

Array = jax.Array

model_default = dict(
    input_embedding={"node": {"input_dim": 95, "output_dim": 64},
                     "edge": {"input_dim": 15, "output_dim": 64},
                     "graph": {"input_dim": 32, "output_dim": 32}},
    set2set_args={"channels": 32, "T": 3},
    node_mlp_args={"units": [100, 50], "activation": ["relu", "linear"]},
    edge_mlp_args={"units": [100, 100, 100, 100, 50], "activation": "relu"},
    pooling_args={"pooling_method": "sum"},
    depth=3, use_set2set=False,
    output_embedding="graph",
    output_mlp={"units": [1], "activation": ["linear"]},
)


class INorp(nn.Module):
    config: Dict[str, Any]

    @nn.compact
    def __call__(self, batch: GraphBatch, train: bool = False) -> Dict[str, Array]:
        cfg = self.config
        x = batch.nodes.get("node_attributes", batch.nodes.get("node_number"))
        n = OptionalInputEmbedding(**cfg["input_embedding"]["node"])(x)
        ed = batch.edges.get("edge_attributes")
        if ed is not None:
            ed = OptionalInputEmbedding(**cfg["input_embedding"].get(
                "edge", {"input_dim": 15, "output_dim": 64}))(ed)
        else:
            ed = jnp.zeros((batch.n_edge, 8), dtype=n.dtype)
        us = batch.globals.get("graph_attributes")
        if us is None:
            us = jnp.zeros((batch.n_graphs, 8), dtype=n.dtype)

        for i in range(cfg["depth"]):
            ni = gather_nodes(n, batch.receivers)
            nj = gather_nodes(n, batch.senders)
            # reference concatenates [outgoing, ingoing, edge]
            # (INorp.py: upd = concat([eu2, eu1]); eu = concat([upd, ed]))
            eu = jnp.concatenate([nj, ni, ed], axis=-1)
            eu = MLP(cfg["edge_mlp_args"]["units"],
                     activation=cfg["edge_mlp_args"]["activation"],
                     name=f"edge_mlp_{i}")(eu)
            pooled = pool_edges_to_nodes(batch, eu, **cfg["pooling_args"])
            nu = jnp.concatenate([n, pooled, gather_state(us, batch)], axis=-1)
            n = MLP(cfg["node_mlp_args"]["units"],
                    activation=cfg["node_mlp_args"]["activation"],
                    name=f"node_mlp_{i}")(nu)

        if cfg["output_embedding"] == "graph":
            n = n * batch.node_mask[:, None].astype(n.dtype)
            if cfg["use_set2set"]:
                from ..layers.pool.set2set import Set2Set
                out = Set2Set(**cfg["set2set_args"], name="set2set")(batch, n)
            else:
                # reference output readout uses pooling_args too
                # (INorp.py: PoolingNodes(**pooling_args))
                out = pool_nodes_to_graph(batch, n, **cfg["pooling_args"])
            out = MLP(cfg["output_mlp"]["units"],
                      activation=cfg["output_mlp"]["activation"], name="out_mlp")(out)
        else:
            out = MLP(cfg["output_mlp"]["units"],
                      activation=cfg["output_mlp"]["activation"], name="out_mlp")(n)
        return {"output": out}


def make_model(**kwargs) -> INorp:
    cfg = update_model_kwargs(model_default, kwargs)
    return INorp(config=cfg)
