"""AttentiveFP model (parity: ``kgcnn/literature/AttentiveFP.py``; layers at
``kgcnn/layers/conv/attentivefp_conv.py:10,124``): attention message blocks
with GRU node updates, attentive graph readout with GRU over timesteps."""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..batch import GraphBatch
from ..layers.aggr import (
    gather_nodes, pool_edges_to_nodes_attention, pool_nodes_to_graph,
)
from ..layers.conv.basic import GRUUpdate
from ..layers.mlp import Dense, MLP
from ..ops.segment import segment_softmax, segment_sum
from .common import OptionalInputEmbedding
from .registry import update_model_kwargs

Array = jax.Array

model_default = dict(
    input_embedding={"node": {"input_dim": 95, "output_dim": 64},
                     "edge": {"input_dim": 5, "output_dim": 64}},
    attention_args={"units": 200},
    depthato=2, depthmol=2,
    dropout=0.2,
    output_embedding="graph",
    output_mlp={"units": [200, 1], "activation": ["kgcnn>leaky_relu", "linear"]},
)


class AttentiveHeadFP(nn.Module):
    """attentivefp_conv.py:10 — attention over neighbors with edge features."""

    units: int
    use_edge_features: bool = False

    @nn.compact
    def __call__(self, batch: GraphBatch, nodes: Array, edges) -> Array:
        ni = gather_nodes(nodes, batch.receivers)
        nj = gather_nodes(nodes, batch.senders)
        if self.use_edge_features and edges is not None:
            nj = Dense(self.units, activation="linear", name="edge_proj")(
                jnp.concatenate([nj, edges], axis=-1))
        else:
            nj = Dense(self.units, activation="linear", name="node_proj")(nj)
        align = Dense(1, activation="leaky_relu", name="align")(
            jnp.concatenate([ni, nj], axis=-1))
        h = pool_edges_to_nodes_attention(batch, jax.nn.elu(nj), align)
        return h


class AttentiveFP(nn.Module):
    config: Dict[str, Any]

    @nn.compact
    def __call__(self, batch: GraphBatch, train: bool = False) -> Dict[str, Array]:
        cfg = self.config
        units = cfg["attention_args"]["units"]
        x = batch.nodes.get("node_attributes", batch.nodes.get("node_number"))
        n = OptionalInputEmbedding(**cfg["input_embedding"]["node"])(x)
        ed = batch.edges.get("edge_attributes")
        if ed is not None:
            ed = OptionalInputEmbedding(**cfg["input_embedding"].get(
                "edge", {"input_dim": 5, "output_dim": 64}))(ed)
        n = Dense(units, activation="linear", name="node_in")(n)

        h = AttentiveHeadFP(units, use_edge_features=True, name="head_0")(
            batch, n, ed)
        n = GRUUpdate(units, name="gru_0")(n, h)
        for i in range(1, cfg["depthato"]):
            h = AttentiveHeadFP(units, name=f"head_{i}")(batch, n, None)
            n = GRUUpdate(units, name=f"gru_{i}")(n, h)

        if cfg["output_embedding"] == "graph":
            # attentive whole-graph readout with GRU state over depthmol steps
            n = n * batch.node_mask[:, None].astype(n.dtype)
            state = pool_nodes_to_graph(batch, n, mode="sum")
            gru_mol = GRUUpdate(units, name="gru_mol")
            for t in range(cfg["depthmol"]):
                state_n = jnp.take(state, batch.graph_id, axis=0)
                align = Dense(1, activation="leaky_relu", name=f"align_mol_{t}")(
                    jnp.concatenate([state_n, n], axis=-1))
                a = segment_softmax(align, batch.graph_id, batch.n_graphs,
                                    mask=batch.node_mask)
                ctx = segment_sum(jax.nn.elu(n) * a, batch.graph_id, batch.n_graphs)
                state = gru_mol(state, ctx)
            out = MLP(cfg["output_mlp"]["units"],
                      activation=cfg["output_mlp"]["activation"], name="out_mlp")(state)
        else:
            out = MLP(cfg["output_mlp"]["units"],
                      activation=cfg["output_mlp"]["activation"], name="out_mlp")(n)
        return {"output": out}


def make_model(**kwargs) -> AttentiveFP:
    cfg = update_model_kwargs(model_default, kwargs)
    return AttentiveFP(config=cfg)
