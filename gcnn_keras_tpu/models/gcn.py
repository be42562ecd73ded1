"""GCN model (parity: ``kgcnn/literature/GCN.py:38`` make_model).

Inputs in the batch: ``nodes['node_attributes']`` (or integer
``node_number`` -> embedding), ``edges['edge_weights']`` with
symmetric-normalized weights from preprocessing.
"""
from __future__ import annotations

from typing import Any, Dict, Sequence

import jax
import flax.linen as nn

from ..batch import GraphBatch
from ..layers.conv.gcn import GCNConv
from .common import OptionalInputEmbedding, GraphOutputHead
from .registry import update_model_kwargs

Array = jax.Array

model_default = dict(
    input_embedding={"node": {"input_dim": 95, "output_dim": 64}},
    gcn_args={"units": 100, "activation": "relu", "pooling_method": "sum"},
    depth=3,
    # the reference's graph readout is PoolingNodes() whose default is MEAN
    # (kgcnn/layers/pooling.py:194), not sum
    node_pooling_args={"pooling_method": "mean"},
    output_embedding="graph",
    output_mlp={"units": [140, 70, 1], "activation": ["relu", "relu", "linear"]},
    node_key="node_attributes",
    edge_weight_key="edge_weights",
)


class GCN(nn.Module):
    config: Dict[str, Any]

    @nn.compact
    def __call__(self, batch: GraphBatch, train: bool = False) -> Dict[str, Array]:
        cfg = self.config
        emb_cfg = cfg["input_embedding"]["node"]
        key = cfg["node_key"]
        x = batch.nodes.get(key, batch.nodes.get("node_number"))
        h = OptionalInputEmbedding(**emb_cfg)(x)
        ew = batch.edges[cfg["edge_weight_key"]]
        if ew.ndim == 1:
            ew = ew[:, None]
        # map to units before the conv stack (reference GCN.py:96
        # "Map to units" Dense, linear with bias)
        from ..layers.mlp import Dense
        h = Dense(cfg["gcn_args"]["units"], activation="linear",
                  name="embed_to_units")(h)
        for i in range(cfg["depth"]):
            h = GCNConv(**cfg["gcn_args"], name=f"gcn_{i}")(batch, h, ew)
        out_cfg = cfg["output_mlp"]
        out = GraphOutputHead(
            units=out_cfg["units"], activation=out_cfg["activation"],
            use_bias=out_cfg.get("use_bias", True),
            pooling_method=cfg.get("node_pooling_args",
                                   {}).get("pooling_method", "mean"),
            output_embedding=cfg["output_embedding"],
            # reference pools nodes FIRST, then applies the output MLP
            # (literature/GCN.py:101-103)
            pool_first=True, name="output")(batch, h)
        return {"output": out}


def make_model(**kwargs) -> GCN:
    cfg = update_model_kwargs(model_default, kwargs)
    return GCN(config=cfg)


model_default_weighted = dict(
    input_embedding={"node": {"input_dim": 95, "output_dim": 64}},
    gcn_args={"units": 100, "activation": "relu", "pooling_method": "sum"},
    depth=3,
    output_embedding="graph",
    output_mlp={"units": [25, 10, 1],
                "activation": ["relu", "relu", "sigmoid"]},
    node_key="node_attributes",
    edge_weight_key="edge_weights",
    node_weight_key="node_weights",
)


class GCNWeighted(nn.Module):
    """Weighted GCN (parity: ``kgcnn/literature/GCN.py:132``
    make_model_weighted): same conv stack, but the graph readout is a
    node-weight-weighted sum (reference ``PoolingWeightedNodes``) using
    ``nodes['node_weights']`` (e.g. a node mask or per-node weights)."""
    config: Dict[str, Any]

    @nn.compact
    def __call__(self, batch: GraphBatch, train: bool = False) -> Dict[str, Array]:
        cfg = self.config
        emb_cfg = cfg["input_embedding"]["node"]
        x = batch.nodes.get(cfg["node_key"], batch.nodes.get("node_number"))
        h = OptionalInputEmbedding(**emb_cfg)(x)
        ew = batch.edges[cfg["edge_weight_key"]]
        if ew.ndim == 1:
            ew = ew[:, None]
        nw = batch.nodes[cfg["node_weight_key"]]
        if nw.ndim == 1:
            nw = nw[:, None]
        from ..layers.mlp import Dense, MLP
        h = Dense(cfg["gcn_args"]["units"], activation="linear",
                  name="embed_to_units")(h)
        for i in range(cfg["depth"]):
            h = GCNConv(**cfg["gcn_args"], name=f"gcn_{i}")(batch, h, ew)
        out_cfg = cfg["output_mlp"]
        if cfg["output_embedding"] == "graph":
            from ..layers.aggr import pool_nodes_to_graph
            # PoolingWeightedNodes: multiply by node weights, then MEAN per
            # graph (reference default, kgcnn/layers/pooling.py:245).
            # No node_mask needed: padding nodes live only in the dead last
            # graph slot (batch.py invariant), same readout idiom as the
            # other models.
            hw = h * nw
            out = pool_nodes_to_graph(batch, hw, pooling_method="mean")
            out = MLP(out_cfg["units"], activation=out_cfg["activation"],
                      use_bias=out_cfg.get("use_bias", True), name="output")(out)
        else:  # node
            out = MLP(out_cfg["units"], activation=out_cfg["activation"],
                      use_bias=out_cfg.get("use_bias", True), name="output")(h)
        return {"output": out}


def make_model_weighted(**kwargs) -> GCNWeighted:
    cfg = update_model_kwargs(model_default_weighted, kwargs)
    return GCNWeighted(config=cfg)
