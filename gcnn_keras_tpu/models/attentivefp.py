"""AttentiveFP model (parity: ``kgcnn/literature/AttentiveFP.py``; layers at
``kgcnn/layers/conv/attentivefp_conv.py:10,124``): attention message blocks
with GRU node updates, attentive graph readout with a GRU over timesteps.

Structure is reference-exact (verified by golden parity in
``tests/test_reference_parity.py``): the attention head computes
``a_ij = W_a . leaky_relu(W_e [h_i || h_j])`` and pools ``W h_j`` with the
per-receiver softmax of ``a_ij``; the readout iterates a keras-layout GRU
over graph-attention contexts.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..batch import GraphBatch
from ..layers.aggr import (
    gather_nodes, gather_state, pool_edges_to_nodes_attention,
    pool_nodes_to_graph, pool_nodes_to_graph_attention,
)
from ..layers.conv.basic import KerasGRUCellUpdate
from ..layers.mlp import Dense, MLP
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
    """attentivefp_conv.py:10 — attention head over neighbors.

    With ``use_edge_features``: ``n_in = fc1(h_i)``,
    ``n_out = fc2([h_j || e_ij])``; then ``wn = W n_out``,
    ``a = W_a leaky_relu(W_e [n_in || n_out])``, attention-pool ``wn`` per
    receiver, final elu (attentivefp_conv.py call order :77-110).
    """

    units: int
    use_edge_features: bool = False

    @nn.compact
    def __call__(self, batch: GraphBatch, nodes: Array,
                 edges: Optional[Array] = None) -> Array:
        n_in = gather_nodes(nodes, batch.receivers)
        n_out = gather_nodes(nodes, batch.senders)
        if self.use_edge_features:
            n_in = Dense(self.units, activation="kgcnn>leaky_relu",
                         name="fc1")(n_in)
            n_out = Dense(self.units, activation="kgcnn>leaky_relu",
                          name="fc2")(jnp.concatenate([n_out, edges], axis=-1))
        wn_out = Dense(self.units, activation="linear",
                       name="linear_trafo")(n_out)
        e_ij = Dense(self.units, activation="kgcnn>leaky_relu",
                     name="alpha_activation")(
            jnp.concatenate([n_in, n_out], axis=-1))
        a_ij = Dense(1, activation="linear", use_bias=False,
                     name="alpha")(e_ij)
        n_i = pool_edges_to_nodes_attention(batch, wn_out, a_ij)
        return jax.nn.elu(n_i)


class PoolingNodesAttentive(nn.Module):
    """attentivefp_conv.py:124 — attentive whole-graph readout: start from
    the sum-pool, then ``depth`` GRU steps on elu(attention-pooled ``W n``)
    contexts with logits ``W_a leaky_relu`` over ``[state || n]``."""

    units: int
    depth: int = 3

    @nn.compact
    def __call__(self, batch: GraphBatch, nodes: Array) -> Array:
        h = pool_nodes_to_graph(batch, nodes, mode="sum")
        wn = Dense(self.units, activation="linear", name="linear_trafo")(nodes)
        alpha = Dense(1, activation="kgcnn>leaky_relu", name="alpha")
        gru = KerasGRUCellUpdate(self.units, name="gru")
        for _ in range(self.depth):
            hv = gather_state(h, batch)
            av = alpha(jnp.concatenate([hv, nodes], axis=-1))
            cont = pool_nodes_to_graph_attention(batch, wn, av)
            h = gru(h, jax.nn.elu(cont))
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
        if ed is not None and ed.ndim == 1:
            ed = OptionalInputEmbedding(**cfg["input_embedding"].get(
                "edge", {"input_dim": 5, "output_dim": 64}))(ed)

        nk = Dense(units, activation="linear", name="node_in")(n)
        ck = AttentiveHeadFP(units, use_edge_features=True, name="head_0")(
            batch, nk, ed)
        nk = KerasGRUCellUpdate(units, name="gru_0")(nk, ck)
        for i in range(1, cfg["depthato"]):
            ck = AttentiveHeadFP(units, name=f"head_{i}")(batch, nk)
            nk = KerasGRUCellUpdate(units, name=f"gru_{i}")(nk, ck)
            if train and cfg.get("dropout"):
                nk = nn.Dropout(rate=cfg["dropout"], deterministic=not train)(nk)

        if cfg["output_embedding"] == "graph":
            # padding nodes carry zero features into the masked readout
            nk = nk * batch.node_mask[:, None].astype(nk.dtype)
            state = PoolingNodesAttentive(units, depth=cfg["depthmol"],
                                          name="pool_attentive")(batch, nk)
            out = MLP(cfg["output_mlp"]["units"],
                      activation=cfg["output_mlp"]["activation"],
                      name="out_mlp")(state)
        else:
            out = MLP(cfg["output_mlp"]["units"],
                      activation=cfg["output_mlp"]["activation"],
                      name="out_mlp")(nk)
        return {"output": out}


def make_model(**kwargs) -> AttentiveFP:
    cfg = update_model_kwargs(model_default, kwargs)
    return AttentiveFP(config=cfg)
