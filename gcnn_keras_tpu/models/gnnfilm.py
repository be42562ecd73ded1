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
    # reference default modulation activation is SIGMOID (GNNFilm.py)
    dense_modulation_kwargs={"units": 64, "num_relations": 20,
                             "activation": "sigmoid"},
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
            msg = RelationalDense(
                u, r, activation=cfg["dense_relation_kwargs"].get(
                    "activation", "linear"), name=f"w_rel_{i}")(hj, rel)
            hi = gather_nodes(n, batch.receivers)
            um = cfg["dense_modulation_kwargs"]["units"]
            rm = cfg["dense_modulation_kwargs"]["num_relations"]
            mod_act = cfg["dense_modulation_kwargs"].get("activation", "sigmoid")
            gamma = RelationalDense(um, rm, activation=mod_act,
                                    name=f"gamma_{i}")(hi, rel)
            beta = RelationalDense(um, rm, activation=mod_act,
                                   name=f"beta_{i}")(hi, rel)
            # FiLM: modulate, pool, THEN activate (reference GNNFilm.py:
            # n = Activation(...)(PoolingLocalMessages(...)(gamma*h_j+beta)))
            msg = gamma * msg + beta
            n = act(pool_edges_to_nodes(batch, msg, mode="sum"))

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


def make_model(**kwargs) -> GNNFilm:
    cfg = update_model_kwargs(model_default, kwargs)
    return GNNFilm(config=cfg)
