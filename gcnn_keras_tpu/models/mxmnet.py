"""MXMNet — multiplex molecular graph network (parity:
``kgcnn/literature/MXMNet.py``; layers at ``kgcnn/layers/conv/mxmnet_conv.py:
12,86``): a GLOBAL message-passing layer on the molecular (bond) graph and a
LOCAL geometric layer on the range graph with Bessel radial features, run in
parallel per depth with summed node outputs.

This implementation uses the bond edges for global MP and the same edge set
with radial basis for local MP when no separate ``range_indices`` batch is
provided (the flat batch carries one edge set)."""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..batch import GraphBatch
from ..layers.aggr import gather_nodes, pool_edges_to_nodes, pool_nodes_to_graph
from ..layers.geometry import edge_distances, bessel_basis, cosine_cutoff_envelope
from ..layers.mlp import Dense, MLP
from .common import OptionalInputEmbedding
from .registry import update_model_kwargs

Array = jax.Array

model_default = dict(
    input_embedding={"node": {"input_dim": 95, "output_dim": 64},
                     "edge": {"input_dim": 32, "output_dim": 64}},
    bessel_basis_local={"num_radial": 16, "cutoff": 5.0},
    mlp_rbf_kwargs={"units": 64, "activation": "swish"},
    units=64,
    depth=4,
    output_embedding="graph",
    node_pooling_args={"pooling_method": "sum"},
    output_mlp={"units": [1], "activation": ["linear"]},
)


class MXMGlobalMP(nn.Module):
    """mxmnet_conv.py:12 — message passing with residual MLPs."""

    units: int = 64

    @nn.compact
    def __call__(self, batch: GraphBatch, h: Array, edge_attr: Array) -> Array:
        hi = gather_nodes(h, batch.receivers)
        hj = gather_nodes(h, batch.senders)
        msg = MLP([self.units, self.units], activation=["swish", "linear"],
                  name="msg_mlp")(jnp.concatenate([hi, hj, edge_attr], axis=-1))
        agg = pool_edges_to_nodes(batch, msg, mode="sum")
        upd = MLP([self.units, self.units], activation=["swish", "linear"],
                  name="upd_mlp")(jnp.concatenate([h, agg], axis=-1))
        return h + upd


class MXMLocalMP(nn.Module):
    """mxmnet_conv.py:86 — geometric message passing on the radial graph."""

    units: int = 64

    @nn.compact
    def __call__(self, batch: GraphBatch, h: Array, rbf: Array) -> Array:
        hj = gather_nodes(h, batch.senders)
        w = Dense(self.units, activation="linear", name="rbf_w")(rbf)
        msg = hj * w
        agg = pool_edges_to_nodes(batch, msg, mode="sum")
        upd = MLP([self.units, self.units], activation=["swish", "linear"],
                  name="upd_mlp")(jnp.concatenate([h, agg], axis=-1))
        return h + upd


class MXMNet(nn.Module):
    config: Dict[str, Any]

    @nn.compact
    def __call__(self, batch: GraphBatch, train: bool = False) -> Dict[str, Array]:
        cfg = self.config
        u = cfg["units"]
        x = batch.nodes.get("node_attributes", batch.nodes.get("node_number"))
        h = OptionalInputEmbedding(**cfg["input_embedding"]["node"])(x)
        h = Dense(u, activation="linear", name="proj")(h)
        ed = batch.edges.get("edge_attributes")
        if ed is None:
            ed = jnp.zeros((batch.n_edge, 8), dtype=h.dtype)

        bb = cfg["bessel_basis_local"]
        d = edge_distances(batch)
        rbf = bessel_basis(d, num_radial=bb["num_radial"], cutoff=bb["cutoff"])
        rbf = rbf * cosine_cutoff_envelope(d, bb["cutoff"])
        rbf = rbf * batch.edge_mask[:, None].astype(rbf.dtype)
        rbf = Dense(cfg["mlp_rbf_kwargs"]["units"],
                    activation=cfg["mlp_rbf_kwargs"]["activation"],
                    name="rbf_mlp")(rbf)

        node_out = 0.0
        for i in range(cfg["depth"]):
            h = MXMGlobalMP(units=u, name=f"global_{i}")(batch, h, ed)
            h = MXMLocalMP(units=u, name=f"local_{i}")(batch, h, rbf)
            node_out = node_out + Dense(1, activation="linear",
                                        name=f"out_{i}")(h)

        node_out = node_out * batch.node_mask[:, None].astype(h.dtype)
        if cfg["output_embedding"] == "graph":
            out = pool_nodes_to_graph(batch, node_out, **cfg["node_pooling_args"])
        else:
            out = node_out
        return {"output": out}


def make_model(**kwargs) -> MXMNet:
    cfg = update_model_kwargs(model_default, kwargs)
    return MXMNet(config=cfg)
