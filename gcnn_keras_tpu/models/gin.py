"""GIN model (parity: ``kgcnn/literature/GIN.py`` make_model / make_model_edge).

GIN: depth x (GIN conv -> GraphMLP phi); readout sums EVERY layer's node
embedding (jumping knowledge style) with its own output Dense, like the
reference implementation.
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..batch import GraphBatch
from ..layers.conv.basic import GIN as GINConv, GINE as GINEConv
from ..layers.mlp import MLP, Dense
from ..layers.norm import GraphBatchNorm
from ..layers.aggr import pool_nodes_to_graph
from .common import OptionalInputEmbedding
from .registry import update_model_kwargs

Array = jax.Array

model_default = dict(
    input_embedding={"node": {"input_dim": 95, "output_dim": 64}},
    depth=3,
    dropout=0.0,
    gin_args={"pooling_method": "sum", "epsilon_learnable": False},
    # reference gin_mlp applies dense -> graph-batch-norm -> activation per
    # layer (literature/GIN.py model_default)
    gin_mlp={"units": [64, 64], "activation": ["relu", "linear"],
             "use_normalization": True, "normalization_technique": "graph_batch"},
    last_mlp={"units": [64, 64, 64], "activation": ["relu", "relu", "linear"]},
    output_embedding="graph",
    output_mlp={"units": [1], "activation": ["linear"]},
    node_pooling_args={"pooling_method": "mean"},
)


class GINModel(nn.Module):
    config: Dict[str, Any]
    use_edges: bool = False

    @nn.compact
    def __call__(self, batch: GraphBatch, train: bool = False) -> Dict[str, Array]:
        cfg = self.config
        x = batch.nodes.get("node_attributes", batch.nodes.get("node_number"))
        h = OptionalInputEmbedding(**cfg["input_embedding"]["node"])(x)
        gin_units = cfg["gin_mlp"]["units"]
        n_units = gin_units[-1] if isinstance(gin_units, (list, tuple)) \
            else int(gin_units)
        # map to units with one LINEAR dense (literature/GIN.py:95)
        h = Dense(n_units, activation="linear", name="embed_to_units")(h)
        ed = batch.edges.get("edge_attributes") if self.use_edges else None
        if self.use_edges and ed is not None:
            ed = Dense(n_units, activation="linear",
                       name="edge_to_units")(ed)

        def gin_mlp(i):
            return MLP(cfg["gin_mlp"]["units"],
                       activation=cfg["gin_mlp"]["activation"],
                       use_normalization=cfg["gin_mlp"].get(
                           "use_normalization", False),
                       normalization_technique=cfg["gin_mlp"].get(
                           "normalization_technique", "graph_batch"),
                       name=f"gin_mlp_{i}")

        embeddings = [h]
        for i in range(cfg["depth"]):
            if self.use_edges and ed is not None:
                h = GINEConv(**cfg["gin_args"], name=f"gine_{i}")(batch, h, ed)
            else:
                h = GINConv(**cfg["gin_args"], name=f"gin_{i}")(batch, h)
            h = gin_mlp(i)(h, mask=batch.node_mask, train=train)
            embeddings.append(h)

        if cfg["output_embedding"] == "graph":
            # per-depth readout: mean-pool -> last_mlp -> dropout -> sum
            # (literature/GIN.py:104-108; PoolingNodes default is mean)
            pool_mode = cfg.get("node_pooling_args",
                                {}).get("pooling_method", "mean")
            outs = []
            for i, e in enumerate(embeddings):
                e = e * batch.node_mask[:, None].astype(e.dtype)
                p = pool_nodes_to_graph(batch, e, mode=pool_mode)
                p = MLP(cfg["last_mlp"]["units"],
                        activation=cfg["last_mlp"]["activation"],
                        name=f"out_mlp_{i}")(p)
                if cfg.get("dropout"):
                    p = nn.Dropout(cfg["dropout"], deterministic=not train)(p)
                outs.append(p)
            out = sum(outs)
            out = MLP(cfg["output_mlp"]["units"],
                      activation=cfg["output_mlp"]["activation"], name="final")(out)
        else:
            out = MLP(cfg["last_mlp"]["units"],
                      activation=cfg["last_mlp"]["activation"],
                      name="last_mlp_node")(h)
            out = MLP(cfg["output_mlp"]["units"],
                      activation=cfg["output_mlp"]["activation"], name="final")(out)
        return {"output": out}


def make_model(**kwargs) -> GINModel:
    cfg = update_model_kwargs(model_default, kwargs)
    return GINModel(config=cfg)


def make_model_edge(**kwargs) -> GINModel:
    cfg = update_model_kwargs(model_default, kwargs)
    cfg.setdefault("input_embedding", {}).setdefault(
        "edge", {"input_dim": 5, "output_dim": 64})
    return GINModel(config=cfg, use_edges=True)
