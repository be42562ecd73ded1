"""HamNet (parity: ``kgcnn/literature/HamNet.py:108-172``; layers at
``kgcnn/layers/conv/hamnet_conv.py:16,102,227,392``): attentive dynamic
message passing over given (or learned) positions/momenta, with a
GRU-iterated attentive fingerprint readout.

Faithful to the reference math:

- init: node/edge features -> ``Dense(units, tanh)`` each
  (``HamNet.py:127-129``), ``q`` = coordinates, ``p`` = zeros.
- ``HamNaiveDynMessage`` (``hamnet_conv.py:392``): with ``i`` the receiving
  node (edge index 0) and ``j`` the sending node (index 1),
  ``align_ij = w^T [p_j-p_i || q_j-q_i || e_ij]``,
  ``mv_i = elu( sum_j softmax_i(align_ij) * act(W h_j) )``,
  ``me_ij = act(W_e [h_i || p_j-p_i || q_j-q_i || h_j])``.
- node union: keras-layout GRU cell (``HamNetGRUUnion = GRUUpdate``,
  ``hamnet_conv.py:12``); edge union per config.
- ``HamNetFingerprintGenerator`` (``hamnet_conv.py:227``):
  ``s^0 = pool(act(W h))`` then ``depth`` iterations of attentive readout
  (``HamNetGlobalReadoutAttend``, ``hamnet_conv.py:102``) + GRU + final
  activation.
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..batch import GraphBatch
from ..layers.aggr import (gather_nodes, gather_state,
                           pool_edges_to_nodes_attention,
                           pool_nodes_to_graph,
                           pool_nodes_to_graph_attention)
from ..layers.conv.basic import KerasGRUCellUpdate
from ..layers.mlp import Dense, MLP
from ..ops.activ import get_activation
from .common import OptionalInputEmbedding
from .registry import update_model_kwargs

Array = jax.Array

model_default = dict(
    name="HamNet",
    input_embedding={"node": {"input_dim": 95, "output_dim": 64},
                     "edge": {"input_dim": 5, "output_dim": 64}},
    message_kwargs={"units": 128, "units_edge": 128},
    fingerprint_kwargs={"units": 128, "units_attend": 128, "depth": 2},
    gru_kwargs={"units": 128},
    verbose=10, depth=1,
    union_type_node="gru",
    union_type_edge="None",
    given_coordinates=True,
    output_embedding="graph", output_to_tensor=True,
    output_mlp={"use_bias": [True, True, False], "units": [25, 10, 1],
                "activation": ["relu", "relu", "linear"]},
)


class HamNaiveDynMessage(nn.Module):
    """hamnet_conv.py:392 — attentive message using p/q node coordinates."""

    units: int = 128
    units_edge: int = 128
    activation: Any = "kgcnn>leaky_relu"
    activation_last: Any = "elu"

    @nn.compact
    def __call__(self, batch: GraphBatch, h: Array, e: Array,
                 p: Array, q: Array):
        hi = gather_nodes(h, batch.receivers)
        hj = gather_nodes(h, batch.senders)
        p_uv = gather_nodes(p, batch.senders) - gather_nodes(p, batch.receivers)
        q_uv = gather_nodes(q, batch.senders) - gather_nodes(q, batch.receivers)

        attend = Dense(self.units, activation=self.activation,
                       name="dense_attend")(hj)
        align = Dense(1, activation="linear", name="dense_align")(
            jnp.concatenate([p_uv, q_uv, e], axis=-1))
        mv = pool_edges_to_nodes_attention(batch, attend, align)
        mv = get_activation(self.activation_last)(mv)

        me = Dense(self.units_edge, activation=self.activation,
                   name="dense_e")(
            jnp.concatenate([hi, p_uv, q_uv, hj], axis=-1))
        return mv, me


class HamNetFingerprintGenerator(nn.Module):
    """hamnet_conv.py:227 — attentive readout iterated with a GRU cell."""

    units: int = 128
    units_attend: int = 128
    depth: int = 2
    activation: Any = "kgcnn>leaky_relu"
    pooling_method: str = "mean"

    @nn.compact
    def __call__(self, batch: GraphBatch, h: Array) -> Array:
        act = get_activation(self.activation)
        hm = Dense(self.units, activation=self.activation,
                   name="vertex2mol")(h)
        state = pool_nodes_to_graph(batch, hm, mode=self.pooling_method)
        for t in range(self.depth):
            # HamNetGlobalReadoutAttend (hamnet_conv.py:102)
            sn = gather_state(state, batch)
            attend = Dense(self.units_attend, activation=self.activation,
                           name=f"attend_{t}")(h)
            align = Dense(1, activation="linear", name=f"align_{t}")(
                jnp.concatenate([sn, h], axis=-1))
            mm = jax.nn.elu(
                pool_nodes_to_graph_attention(batch, attend, align))
            # union: keras GRUCell(inputs=mm, state=s), then final activation
            state = KerasGRUCellUpdate(self.units, name=f"gru_{t}")(state, mm)
            state = act(state)
        return state


class HamNet(nn.Module):
    config: Dict[str, Any]

    @nn.compact
    def __call__(self, batch: GraphBatch, train: bool = False):
        cfg = self.config
        mu = cfg["gru_kwargs"]["units"]

        h = OptionalInputEmbedding(**cfg["input_embedding"]["node"],
                                   name="node_embed")(
            batch.nodes.get("node_attributes", batch.nodes.get("node_number")))
        e = OptionalInputEmbedding(**cfg["input_embedding"]["edge"],
                                   name="edge_embed")(
            batch.edges.get("edge_attributes", batch.edges.get("edge_number")))

        if cfg["given_coordinates"]:
            q = batch.nodes.get("node_coordinates",
                                jnp.zeros((batch.n_node, 3), dtype=h.dtype))
            p = jnp.zeros_like(q)
        else:
            # Hamiltonian engine is NotImplemented in the reference
            # (HamNet.py:125); learned q/p kept as a working extension here.
            q = Dense(3, activation="tanh", name="q_net")(h)
            p = Dense(3, activation="tanh", name="p_net")(h)

        # initialization Dense(tanh) on nodes and edges (HamNet.py:127-129)
        h = Dense(mu, activation="tanh", name="node_init")(h)
        e = Dense(mu, activation="tanh", name="edge_init")(e)

        for i in range(cfg["depth"]):
            nu, eu = HamNaiveDynMessage(
                **cfg["message_kwargs"], name=f"message_{i}")(batch, h, e, p, q)
            if cfg["union_type_node"] == "gru":
                h = KerasGRUCellUpdate(mu, name=f"gru_union_{i}")(h, nu)
            elif cfg["union_type_node"] == "naive":
                h = Dense(mu, activation="tanh", name=f"union_{i}")(
                    jnp.concatenate([h, nu], axis=-1))
            else:
                h = nu
            if cfg["union_type_edge"] == "gru":
                e = KerasGRUCellUpdate(mu, name=f"gru_union_e_{i}")(e, eu)
            elif cfg["union_type_edge"] == "naive":
                e = Dense(mu, activation="tanh", name=f"union_e_{i}")(
                    jnp.concatenate([e, eu], axis=-1))
            else:
                e = eu

        units = cfg["output_mlp"]["units"]
        use_bias = cfg["output_mlp"].get("use_bias", True)
        if isinstance(use_bias, (list, tuple)) and len(use_bias) != len(units):
            use_bias = True
        if cfg["output_embedding"] == "graph":
            fp = HamNetFingerprintGenerator(
                **cfg["fingerprint_kwargs"], name="fingerprint")(batch, h)
            out = MLP(units, activation=cfg["output_mlp"]["activation"],
                      use_bias=use_bias, name="out_mlp")(fp)
        else:
            out = MLP(units, activation=cfg["output_mlp"]["activation"],
                      use_bias=use_bias, name="out_mlp")(h)
        return {"output": out}


def make_model(**kwargs) -> HamNet:
    cfg = update_model_kwargs(model_default, kwargs)
    return HamNet(config=cfg)
