"""EGNN — E(n)-equivariant GNN (parity: ``kgcnn/literature/EGNN.py``):
m_ij = phi_e(h_i, h_j, ||x_i - x_j||^2, e_ij); coordinate update
x_i' = x_i + sum_j (x_i - x_j) phi_x(m_ij); node update
h_i' = phi_h(h_i, sum_j m_ij)."""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..batch import GraphBatch
from ..layers.aggr import gather_nodes, pool_edges_to_nodes, pool_nodes_to_graph
from ..layers.mlp import Dense, MLP
from .common import OptionalInputEmbedding
from .registry import update_model_kwargs

Array = jax.Array

model_default = dict(
    input_embedding={"node": {"input_dim": 95, "output_dim": 64},
                     "edge": {"input_dim": 95, "output_dim": 64}},
    depth=4,
    node_mlp_initialize=None,
    use_edge_attributes=True,
    edge_mlp_kwargs={"units": [64, 64], "activation": ["swish", "linear"]},
    edge_attention_kwargs=None,
    use_normalized_difference=False,
    expand_distance_kwargs=None,
    coord_mlp_kwargs={"units": [64, 1], "activation": ["swish", "linear"]},
    pooling_coord_kwargs={"pooling_method": "mean"},
    pooling_edge_kwargs={"pooling_method": "sum"},
    node_normalize_kwargs=None,
    node_mlp_kwargs={"units": [64, 64], "activation": ["swish", "linear"]},
    use_skip=True,
    node_pooling_kwargs={"pooling_method": "sum"},
    output_embedding="graph",
    output_mlp={"units": [64, 1], "activation": ["swish", "linear"]},
)


class EGNN(nn.Module):
    config: Dict[str, Any]

    @nn.compact
    def __call__(self, batch: GraphBatch, train: bool = False) -> Dict[str, Array]:
        cfg = self.config
        zx = batch.nodes.get("node_attributes", batch.nodes.get("node_number"))
        h = OptionalInputEmbedding(**cfg["input_embedding"]["node"])(zx)
        # reference: optional initialize MLP, otherwise h = embedding
        # directly (EGNN.py: h = GraphMLP(**node_mlp_initialize)(h0) if ...)
        if cfg.get("node_mlp_initialize"):
            h = MLP(cfg["node_mlp_initialize"]["units"],
                    activation=cfg["node_mlp_initialize"]["activation"],
                    name="node_init")(h)
        x = batch.nodes["node_coordinates"]
        ed = batch.edges.get("edge_attributes") if cfg["use_edge_attributes"] else None

        for i in range(cfg["depth"]):
            hi = gather_nodes(h, batch.receivers)
            hj = gather_nodes(h, batch.senders)
            diff = x[batch.receivers] - x[batch.senders]
            d2 = jnp.sum(diff * diff, axis=-1, keepdims=True)
            # reference uses the euclidean NORM (EuclideanNorm, not squared)
            safe = jnp.maximum(d2, 1e-12)
            norm = jnp.where(d2 > 1e-12, jnp.sqrt(safe), jnp.sqrt(1e-12))
            feats = [hi, hj, norm]
            if ed is not None:
                feats.append(ed)
            m_ij = MLP(cfg["edge_mlp_kwargs"]["units"],
                       activation=cfg["edge_mlp_kwargs"]["activation"],
                       name=f"edge_mlp_{i}")(jnp.concatenate(feats, axis=-1))
            if cfg.get("edge_attention_kwargs"):
                att = Dense(1, activation="sigmoid", name=f"att_{i}")(m_ij)
                m_ij = m_ij * att
            m_ij = m_ij * batch.edge_mask[:, None].astype(m_ij.dtype)

            # coordinate update
            phi_x = MLP(cfg["coord_mlp_kwargs"]["units"],
                        activation=cfg["coord_mlp_kwargs"]["activation"],
                        name=f"coord_mlp_{i}")(m_ij)
            if cfg["use_normalized_difference"]:
                diff = diff / jnp.sqrt(jnp.maximum(d2, 1e-12))
            coord_msg = diff * phi_x
            dx = pool_edges_to_nodes(batch, coord_msg, **cfg["pooling_coord_kwargs"])
            x = x + dx

            # node update
            agg = pool_edges_to_nodes(batch, m_ij, **cfg["pooling_edge_kwargs"])
            hu = MLP(cfg["node_mlp_kwargs"]["units"],
                     activation=cfg["node_mlp_kwargs"]["activation"],
                     name=f"node_mlp_{i}")(jnp.concatenate([h, agg], axis=-1))
            h = h + hu if cfg["use_skip"] else hu

        if cfg["output_embedding"] == "graph":
            h = h * batch.node_mask[:, None].astype(h.dtype)
            out = pool_nodes_to_graph(batch, h, **cfg["node_pooling_kwargs"])
            out = MLP(cfg["output_mlp"]["units"],
                      activation=cfg["output_mlp"]["activation"], name="out_mlp")(out)
        else:
            out = MLP(cfg["output_mlp"]["units"],
                      activation=cfg["output_mlp"]["activation"], name="out_mlp")(h)
        return {"output": out}


def make_model(**kwargs) -> EGNN:
    cfg = update_model_kwargs(model_default, kwargs)
    return EGNN(config=cfg)
