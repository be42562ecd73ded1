"""GAT / GATv2 models (parity: ``kgcnn/literature/GAT.py`` and
``GATv2.py`` make_model: multi-head attention per depth, head concat)."""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..batch import GraphBatch
from ..layers.conv.basic import AttentionHeadGAT, AttentionHeadGATV2
from ..layers.mlp import MLP
from ..layers.aggr import pool_nodes_to_graph
from .common import OptionalInputEmbedding
from .registry import update_model_kwargs

Array = jax.Array

model_default = dict(
    input_embedding={"node": {"input_dim": 95, "output_dim": 64},
                     "edge": {"input_dim": 5, "output_dim": 64}},
    attention_args={"units": 64, "use_edge_features": True, "use_bias": True,
                    "use_final_activation": False, "activation": "leaky_relu"},
    pooling_nodes_args={"pooling_method": "mean"},
    depth=1,
    attention_heads_num=5,
    attention_heads_concat=False,
    output_embedding="graph",
    output_mlp={"units": [64, 32, 1], "activation": ["relu", "relu", "sigmoid"]},
)


class GATModel(nn.Module):
    config: Dict[str, Any]
    v2: bool = False

    @nn.compact
    def __call__(self, batch: GraphBatch, train: bool = False) -> Dict[str, Array]:
        cfg = self.config
        Head = AttentionHeadGATV2 if self.v2 else AttentionHeadGAT
        x = batch.nodes.get("node_attributes", batch.nodes.get("node_number"))
        h = OptionalInputEmbedding(**cfg["input_embedding"]["node"])(x)
        ed = batch.edges.get("edge_attributes")
        if ed is not None:
            ed = OptionalInputEmbedding(**cfg["input_embedding"].get(
                "edge", {"input_dim": 5, "output_dim": 64}))(ed)

        # map to units before the attention stack (reference GAT.py:100 /
        # GATv2.py: "nk = Dense(units, linear)(n)")
        from ..layers.mlp import Dense
        from ..ops.activ import get_activation
        h = Dense(cfg["attention_args"]["units"], activation="linear",
                  name="embed_to_units")(h)
        for i in range(cfg["depth"]):
            heads = [Head(**cfg["attention_args"], name=f"head_{i}_{k}")(batch, h, ed)
                     for k in range(cfg["attention_heads_num"])]
            if cfg["attention_heads_concat"]:
                h = jnp.concatenate(heads, axis=-1)
            else:
                # averaged heads pass through the attention activation
                # (reference GAT.py:106-107)
                h = sum(heads) / len(heads)
                h = get_activation(cfg["attention_args"].get(
                    "activation", "leaky_relu"))(h)

        if cfg["output_embedding"] == "graph":
            h = h * batch.node_mask[:, None].astype(h.dtype)
            out = pool_nodes_to_graph(batch, h, **cfg["pooling_nodes_args"])
            out = MLP(cfg["output_mlp"]["units"],
                      activation=cfg["output_mlp"]["activation"], name="out_mlp")(out)
        else:
            out = MLP(cfg["output_mlp"]["units"],
                      activation=cfg["output_mlp"]["activation"], name="out_mlp")(h)
        return {"output": out}


def make_model(**kwargs) -> GATModel:
    cfg = update_model_kwargs(model_default, kwargs)
    return GATModel(config=cfg)


def make_model_v2(**kwargs) -> GATModel:
    cfg = update_model_kwargs(model_default, kwargs)
    return GATModel(config=cfg, v2=True)
