"""MEGAN — multi-explanation graph attention network (parity:
``kgcnn/literature/MEGAN.py``, 483 LoC): K parallel attention channels whose
edge/node importances form built-in explanations; importance-weighted
per-channel readouts are concatenated for the prediction."""
from __future__ import annotations

from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..batch import GraphBatch
from ..layers.conv.basic import AttentionHeadGATV2
from ..layers.mlp import Dense, MLP
from ..ops.segment import segment_sum
from .common import OptionalInputEmbedding
from .registry import update_model_kwargs

Array = jax.Array

model_default = dict(
    input_embedding={"node": {"input_dim": 95, "output_dim": 64}},
    units=[32, 32, 32],
    importance_units=[16],
    importance_channels=2,
    final_units=[16, 1],
    final_activation="linear",
    use_edge_features=True,
    dropout_rate=0.0,
    sparsity_factor=0.0,
    output_embedding="graph",
)


class MEGAN(nn.Module):
    config: Dict[str, Any]

    @nn.compact
    def __call__(self, batch: GraphBatch, train: bool = False) -> Dict[str, Array]:
        cfg = self.config
        K = cfg["importance_channels"]
        x = batch.nodes.get("node_attributes", batch.nodes.get("node_number"))
        h = OptionalInputEmbedding(**cfg["input_embedding"]["node"])(x)
        ed = batch.edges.get("edge_attributes")

        # attention stack; collect per-layer edge "importance" logits
        edge_logits: List[Array] = []
        for i, u in enumerate(cfg["units"]):
            h = AttentionHeadGATV2(u, use_edge_features=cfg["use_edge_features"],
                                   name=f"att_{i}")(batch, h, ed)
            ni = jnp.take(h, batch.receivers, axis=0)
            nj = jnp.take(h, batch.senders, axis=0)
            edge_logits.append(Dense(K, activation="linear",
                                     name=f"edge_imp_{i}")(
                jnp.concatenate([ni, nj], axis=-1)))

        edge_importance = jax.nn.sigmoid(sum(edge_logits))  # (E, K)
        edge_importance = edge_importance * batch.edge_mask[:, None].astype(h.dtype)
        # node importances: pooled edge importances x learned node factor
        pooled_imp = segment_sum(edge_importance, batch.receivers, batch.n_node,
                                 indices_are_sorted=True)
        node_factor = MLP(list(cfg["importance_units"]) + [K],
                          activation="relu", last_linear=True,
                          name="node_imp_mlp")(h)
        node_importance = jax.nn.sigmoid(node_factor) * pooled_imp  # (N, K)

        outs = []
        for k in range(K):
            weighted = h * node_importance[:, k:k + 1]
            weighted = weighted * batch.node_mask[:, None].astype(h.dtype)
            outs.append(segment_sum(weighted, batch.graph_id, batch.n_graphs,
                                    indices_are_sorted=True))
        graph_emb = jnp.concatenate(outs, axis=-1)
        final_units = list(cfg["final_units"])
        out = MLP(final_units,
                  activation=["relu"] * (len(final_units) - 1)
                  + [cfg["final_activation"]], name="final_mlp")(graph_emb)
        return {"output": out,
                "node_importances": node_importance,
                "edge_importances": edge_importance}


def make_model(**kwargs) -> MEGAN:
    cfg = update_model_kwargs(model_default, kwargs)
    return MEGAN(config=cfg)
