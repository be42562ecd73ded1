"""NMPN / MPNN model (parity: ``kgcnn/literature/NMPN.py`` make_model;
layers at ``kgcnn/layers/conv/mpnn_conv.py``): edge-network message
matrices, GRU node update, Set2Set readout."""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..batch import GraphBatch
from ..layers.aggr import gather_nodes, pool_edges_to_nodes, pool_nodes_to_graph
from ..layers.conv.basic import GRUUpdate, matmul_messages
from ..layers.geometry import edge_distances, gauss_basis
from ..layers.mlp import Dense, MLP
from ..layers.pool.set2set import Set2Set
from .common import OptionalInputEmbedding
from .registry import update_model_kwargs

Array = jax.Array

model_default = dict(
    input_embedding={"node": {"input_dim": 95, "output_dim": 64},
                     "edge": {"input_dim": 5, "output_dim": 64}},
    make_distance=False, expand_distance=False,
    gauss_args={"bins": 20, "distance_max": 4.0, "offset": 0.0, "sigma": 0.4},
    set2set_args={"channels": 32, "T": 3, "pooling_method": "sum"},
    pooling_args={"pooling_method": "sum"},
    edge_mlp={"units": [64, 64, 64], "activation": "swish"},
    use_set2set=True,
    depth=3,
    node_dim=64,
    output_embedding="graph",
    output_mlp={"units": [25, 10, 1], "activation": ["selu", "selu", "sigmoid"],
                "use_bias": [True, True, False]},
)


class NMPN(nn.Module):
    config: Dict[str, Any]

    @nn.compact
    def __call__(self, batch: GraphBatch, train: bool = False) -> Dict[str, Array]:
        cfg = self.config
        f = cfg["node_dim"]
        x = batch.nodes.get("node_attributes", batch.nodes.get("node_number"))
        n0 = OptionalInputEmbedding(**cfg["input_embedding"]["node"])(x)
        n = Dense(f, activation="linear", name="node_proj")(n0)

        if cfg["make_distance"]:
            ed = edge_distances(batch)
            if cfg["expand_distance"]:
                ed = gauss_basis(ed, **cfg["gauss_args"])
        else:
            ed = batch.edges.get("edge_attributes")
            if ed is not None and ed.ndim == 1:
                ed = OptionalInputEmbedding(**cfg["input_embedding"].get(
                    "edge", {"input_dim": 5, "output_dim": 64}))(ed)
        ed = ed * batch.edge_mask[:, None].astype(ed.dtype)

        # TWO edge networks (reference NMPN.py): per-edge (F, F) message
        # matrices for the in- and out-direction, messages concatenated
        trafo_in = MLP(cfg["edge_mlp"]["units"],
                       activation=cfg["edge_mlp"]["activation"],
                       name="edge_net_in")(ed)
        trafo_in = Dense(f * f, activation="linear",
                         name="edge_net_in_out")(trafo_in).reshape(-1, f, f)
        trafo_out = MLP(cfg["edge_mlp"]["units"],
                        activation=cfg["edge_mlp"]["activation"],
                        name="edge_net_out")(ed)
        trafo_out = Dense(f * f, activation="linear",
                          name="edge_net_out_out")(trafo_out).reshape(-1, f, f)

        from ..layers.conv.basic import KerasGRUCellUpdate
        gru = KerasGRUCellUpdate(units=f, name="gru")
        for i in range(cfg["depth"]):
            hj = gather_nodes(n, batch.senders)     # "outgoing" j
            hi = gather_nodes(n, batch.receivers)   # "ingoing" i
            m_in = matmul_messages(trafo_in, hj)
            m_out = matmul_messages(trafo_out, hi)
            eu = jnp.concatenate([m_in, m_out], axis=-1)
            agg = pool_edges_to_nodes(batch, eu, **cfg["pooling_args"])
            n = gru(n, agg)

        # concat initial embedding back in (reference: n = [n0 || n])
        n = jnp.concatenate([n0, n], axis=-1)

        if cfg["output_embedding"] == "graph":
            n = n * batch.node_mask[:, None].astype(n.dtype)
            if cfg["use_set2set"]:
                n = Dense(cfg["set2set_args"]["channels"], activation="linear",
                          name="set2set_proj")(n)
                out = Set2Set(**cfg["set2set_args"], name="set2set")(batch, n)
            else:
                out = pool_nodes_to_graph(batch, n, mode="sum")
            out = MLP(cfg["output_mlp"]["units"],
                      activation=cfg["output_mlp"]["activation"], name="out_mlp")(out)
        else:
            out = MLP(cfg["output_mlp"]["units"],
                      activation=cfg["output_mlp"]["activation"], name="out_mlp")(n)
        return {"output": out}


def make_model(**kwargs) -> NMPN:
    cfg = update_model_kwargs(model_default, kwargs)
    return NMPN(config=cfg)


def make_crystal_model(**kwargs) -> NMPN:
    """Periodic variant (parity: the reference's NMPN crystal configs in
    ``training/hyper/hyper_mp_*.py``): same module with distances computed
    from coordinates; periodicity comes from the batch carrying
    ``range_image`` + ``graph_lattice`` (see ``layers/geometry.py``)."""
    kwargs.setdefault("make_distance", True)
    kwargs.setdefault("expand_distance", True)
    return make_model(**kwargs)
