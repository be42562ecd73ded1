"""CGCNN — crystal graph conv (parity: ``kgcnn/literature/CGCNN.py``;
layer at ``kgcnn/layers/conv/cgcnn_conv.py:9``): gated message
sigmoid(W_f z) * softplus(W_s z) on z = [n_i, n_j, e_ij], residual update,
periodic edges via range_image/graph_lattice."""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..batch import GraphBatch
from ..layers.aggr import gather_nodes, pool_edges_to_nodes, pool_nodes_to_graph
from ..layers.geometry import edge_distances, gauss_basis
from ..layers.mlp import Dense, MLP
from ..layers.norm import GraphBatchNorm
from .common import OptionalInputEmbedding
from .registry import update_model_kwargs

Array = jax.Array

model_default = dict(
    input_embedding={"node": {"input_dim": 95, "output_dim": 64}},
    make_distances=True, expand_distance=True,
    gauss_args={"bins": 60, "distance_max": 6.0, "offset": 0.0, "sigma": 0.4},
    conv_layer_args={"units": 64, "activation_s": "softplus", "activation_out": "softplus",
                     "batch_normalization": True},
    depth=4,
    node_pooling_args={"pooling_method": "mean"},
    output_embedding="graph",
    output_mlp={"units": [64, 1], "activation": ["softplus", "linear"]},
)


class CGCNNLayer(nn.Module):
    units: int = 64
    activation_s: Any = "softplus"
    activation_out: Any = "softplus"
    batch_normalization: bool = True

    @nn.compact
    def __call__(self, batch: GraphBatch, nodes: Array, edges: Array,
                 train: bool = False) -> Array:
        from ..ops.activ import get_activation
        ni = gather_nodes(nodes, batch.receivers)
        nj = gather_nodes(nodes, batch.senders)
        z = jnp.concatenate([ni, nj, edges], axis=-1)
        # reference cgcnn_conv.py: linear f/s denses -> per-branch batch norm
        # -> sigmoid gate x activation_s core; pooled update batch-normed
        # before the residual add, then activation_out
        x_f = Dense(self.units, activation="linear", name="w_f")(z)
        x_s = Dense(self.units, activation="linear", name="w_s")(z)
        if self.batch_normalization:
            x_f = GraphBatchNorm(name="bn_f")(x_f, batch.edge_mask,
                                              use_running_average=not train)
            x_s = GraphBatchNorm(name="bn_s")(x_s, batch.edge_mask,
                                              use_running_average=not train)
        gate = jax.nn.sigmoid(x_f)
        core = get_activation(self.activation_s)(x_s)
        msg = gate * core
        msg = msg * batch.edge_mask[:, None].astype(msg.dtype)
        agg = pool_edges_to_nodes(batch, msg, mode="sum")
        if self.batch_normalization:
            agg = GraphBatchNorm(name="bn_out")(agg, batch.node_mask,
                                                use_running_average=not train)
        return get_activation(self.activation_out)(nodes + agg)


class CGCNN(nn.Module):
    config: Dict[str, Any]

    @nn.compact
    def __call__(self, batch: GraphBatch, train: bool = False) -> Dict[str, Array]:
        cfg = self.config
        x = batch.nodes.get("node_attributes", batch.nodes.get("node_number"))
        n = OptionalInputEmbedding(**cfg["input_embedding"]["node"])(x)
        if cfg["make_distances"]:
            ed = edge_distances(batch)
            if cfg["expand_distance"]:
                ed = gauss_basis(ed, **cfg["gauss_args"])
        else:
            ed = batch.edges["edge_attributes"]
        ed = ed * batch.edge_mask[:, None].astype(ed.dtype)

        units = cfg["conv_layer_args"]["units"]
        n = Dense(units, activation="linear", name="proj")(n)
        for i in range(cfg["depth"]):
            n = CGCNNLayer(**cfg["conv_layer_args"], name=f"conv_{i}")(
                batch, n, ed, train=train)

        if cfg["output_embedding"] == "graph":
            n_masked = n * batch.node_mask[:, None].astype(n.dtype)
            out = pool_nodes_to_graph(batch, n_masked, **cfg["node_pooling_args"])
            out = MLP(cfg["output_mlp"]["units"],
                      activation=cfg["output_mlp"]["activation"], name="out_mlp")(out)
        else:
            out = MLP(cfg["output_mlp"]["units"],
                      activation=cfg["output_mlp"]["activation"], name="out_mlp")(n)
        return {"output": out}


def make_crystal_model(**kwargs) -> CGCNN:
    cfg = update_model_kwargs(model_default, kwargs)
    return CGCNN(config=cfg)


def make_model(**kwargs) -> CGCNN:
    return make_crystal_model(**kwargs)
