"""HamNet (parity: ``kgcnn/literature/HamNet.py``; layers at
``kgcnn/layers/conv/hamnet_conv.py:16,102,227,392``): 'naive' dynamic
message passing over learned positions/momenta (Hamiltonian engine) with an
attentive fingerprint readout."""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..batch import GraphBatch
from ..layers.aggr import gather_nodes, pool_edges_to_nodes
from ..layers.conv.basic import GRUUpdate
from ..layers.mlp import Dense, MLP
from ..ops.segment import segment_softmax, segment_sum
from .common import OptionalInputEmbedding
from .registry import update_model_kwargs

Array = jax.Array

model_default = dict(
    input_embedding={"node": {"input_dim": 95, "output_dim": 64},
                     "edge": {"input_dim": 5, "output_dim": 64}},
    message_kwargs={"units": 128, "units_edge": 128},
    fingerprint_kwargs={"units": 128, "units_attend": 128, "depth": 2},
    gru_kwargs={"units": 128},
    verbose=10, depth=1,
    union_type_node="gru",
    union_type_edge="None",
    given_coordinates=True,
    output_embedding="graph",
    output_mlp={"units": [25, 1], "activation": ["selu", "linear"]},
)


class HamNaiveDynMessage(nn.Module):
    """hamnet_conv.py:392 — message using p/q (momentum/position) features."""

    units: int = 128
    units_edge: int = 128

    @nn.compact
    def __call__(self, batch: GraphBatch, h: Array, e: Array,
                 p: Array, q: Array):
        pi, pj = gather_nodes(p, batch.receivers), gather_nodes(p, batch.senders)
        qi, qj = gather_nodes(q, batch.receivers), gather_nodes(q, batch.senders)
        hj = gather_nodes(h, batch.senders)
        dq = qi - qj
        msg = jnp.concatenate([hj, e, pj, dq], axis=-1)
        msg = Dense(self.units, activation="leaky_softplus", name="msg")(msg)
        agg_h = pool_edges_to_nodes(batch, msg, mode="sum")
        e_new = Dense(self.units_edge, activation="leaky_softplus", name="edge")(
            jnp.concatenate([msg, e], axis=-1))
        return agg_h, e_new


class HamNetFingerprintGenerator(nn.Module):
    """hamnet_conv.py:227 — attentive readout iterated with a GRU."""

    units: int = 128
    units_attend: int = 128
    depth: int = 2

    @nn.compact
    def __call__(self, batch: GraphBatch, h: Array) -> Array:
        state = segment_sum(h * batch.node_mask[:, None].astype(h.dtype),
                            batch.graph_id, batch.n_graphs)
        state = Dense(self.units, activation="tanh", name="init")(state)
        gru = GRUUpdate(self.units, name="gru")
        for t in range(self.depth):
            sn = jnp.take(state, batch.graph_id, axis=0)
            align = Dense(1, activation="leaky_relu", name=f"align_{t}")(
                jnp.concatenate([sn, h], axis=-1))
            a = segment_softmax(align, batch.graph_id, batch.n_graphs,
                                mask=batch.node_mask)
            attend = Dense(self.units_attend, activation="linear",
                           name=f"attend_{t}")(h)
            ctx = segment_sum(attend * a, batch.graph_id, batch.n_graphs)
            state = gru(state, jax.nn.elu(ctx))
        return state


class HamNet(nn.Module):
    config: Dict[str, Any]

    @nn.compact
    def __call__(self, batch: GraphBatch, train: bool = False) -> Dict[str, Array]:
        cfg = self.config
        mu = cfg["message_kwargs"]["units"]
        x = batch.nodes.get("node_attributes", batch.nodes.get("node_number"))
        h = OptionalInputEmbedding(**cfg["input_embedding"]["node"])(x)
        h = Dense(mu, activation="linear", name="h_proj")(h)
        e = batch.edges.get("edge_attributes")
        if e is None:
            e = jnp.zeros((batch.n_edge, 8), dtype=h.dtype)
        e = Dense(cfg["message_kwargs"]["units_edge"], activation="linear",
                  name="e_proj")(e)

        if cfg["given_coordinates"]:
            q = batch.nodes.get("node_coordinates",
                                jnp.zeros((batch.n_node, 3), dtype=h.dtype))
            p = jnp.zeros_like(q)
        else:
            # learned positions/momenta from features (Hamiltonian engine)
            q = Dense(3, activation="tanh", name="q_net")(h)
            p = Dense(3, activation="tanh", name="p_net")(h)

        gru = GRUUpdate(mu, name="gru_union")
        for i in range(cfg["depth"]):
            agg_h, e = HamNaiveDynMessage(
                **cfg["message_kwargs"], name=f"message_{i}")(batch, h, e, p, q)
            if cfg["union_type_node"] == "gru":
                h = gru(h, agg_h)
            else:
                h = h + agg_h

        if cfg["output_embedding"] == "graph":
            fp = HamNetFingerprintGenerator(
                **cfg["fingerprint_kwargs"], name="fingerprint")(batch, h)
            out = MLP(cfg["output_mlp"]["units"],
                      activation=cfg["output_mlp"]["activation"], name="out_mlp")(fp)
        else:
            out = MLP(cfg["output_mlp"]["units"],
                      activation=cfg["output_mlp"]["activation"], name="out_mlp")(h)
        return {"output": out}


def make_model(**kwargs) -> HamNet:
    cfg = update_model_kwargs(model_default, kwargs)
    return HamNet(config=cfg)
