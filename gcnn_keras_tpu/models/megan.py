"""MEGAN — multi-explanation graph attention network (parity:
``kgcnn/literature/MEGAN.py:43-345``): K parallel GATv2 attention channels
whose per-layer attention logits form edge importances, combined with a
learned node factor into node importances; importance-weighted per-channel
readouts are concatenated for the prediction.

Faithful to the reference forward (``MEGAN.call``, ``MEGAN.py:251-345``):

- attention stack = ``MultiHeadGATV2Layer`` (``gat_conv.py:232``) with
  ``num_heads = importance_channels`` and concatenated heads; each head
  returns its scalar logit ``a_ij``.
- ``edge_importances = sigmoid( sum_layers a_ij )`` per channel.
- node-side pooled edge importances are the AVERAGE of mean-poolings over
  both edge directions (receivers and senders) — the undirected-edge
  symmetrization of ``MEGAN.py:283-286``.
- ``node_importances = sigmoid(MLP(x)) * pooled_edges``.
- K sum-poolings of ``x`` weighted by one importance channel each,
  concatenated, then the final Dense stack (all with bias; the reference's
  per-layer bias list is computed but unused, ``MEGAN.py:197-206``).
"""
from __future__ import annotations

from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..batch import GraphBatch
from ..layers.aggr import (gather_nodes, pool_edges_to_nodes,
                           pool_edges_to_nodes_attention)
from ..layers.mlp import Dense
from ..ops.activ import get_activation
from ..ops.segment import segment_ops_by_name, segment_sum
from .common import OptionalInputEmbedding
from .registry import update_model_kwargs

Array = jax.Array

model_default = dict(
    input_embedding={"node": {"input_dim": 95, "output_dim": 64}},
    units=[32, 32, 32],
    importance_units=[16],
    importance_channels=2,
    importance_activation="sigmoid",
    final_units=[16, 1],
    final_activation="linear",
    final_pooling="sum",
    activation="kgcnn>leaky_relu",
    use_bias=True,
    use_edge_features=True,
    dropout_rate=0.0,
    sparsity_factor=0.0,
    regression_reference=None,
    output_embedding="graph",
)


class MultiHeadGATV2(nn.Module):
    """gat_conv.py:232 — returns (new nodes, per-head logits (E, K))."""

    units: int
    num_heads: int
    use_edge_features: bool = True
    activation: Any = "kgcnn>leaky_relu"
    use_bias: bool = True
    concat_heads: bool = True

    @nn.compact
    def __call__(self, batch: GraphBatch, x: Array, ed):
        act = get_activation(self.activation)
        xi = gather_nodes(x, batch.receivers)
        xj = gather_nodes(x, batch.senders)
        if self.use_edge_features and ed is not None:
            e_ij = jnp.concatenate([xi, xj, ed], axis=-1)
        else:
            e_ij = jnp.concatenate([xi, xj], axis=-1)
        h_list: List[Array] = []
        a_list: List[Array] = []
        for k in range(self.num_heads):
            wn = Dense(self.units, activation=self.activation,
                       use_bias=self.use_bias, name=f"head_{k}_linear")(x)
            a = Dense(self.units, activation=self.activation,
                      use_bias=self.use_bias, name=f"head_{k}_alpha_act")(e_ij)
            a = Dense(1, activation="linear", use_bias=False,
                      name=f"head_{k}_alpha")(a)          # (E, 1)
            h = pool_edges_to_nodes_attention(
                batch, gather_nodes(wn, batch.senders), a)
            h_list.append(act(h))
            a_list.append(a)
        alphas = jnp.concatenate(a_list, axis=-1)          # (E, K)
        if self.concat_heads:
            h_out = jnp.concatenate(h_list, axis=-1)
        else:
            h_out = sum(h_list) / float(self.num_heads)
        return h_out, alphas


class MEGAN(nn.Module):
    config: Dict[str, Any]

    @nn.compact
    def __call__(self, batch: GraphBatch, train: bool = False) -> Dict[str, Array]:
        cfg = self.config
        K = cfg["importance_channels"]
        imp_act = get_activation(cfg["importance_activation"])
        xin = batch.nodes.get("node_attributes", batch.nodes.get("node_number"))
        h = OptionalInputEmbedding(**cfg["input_embedding"]["node"],
                                   name="node_embed")(xin)
        ed = batch.edges.get("edge_attributes")

        x = h
        alphas: List[Array] = []
        for i, u in enumerate(cfg["units"]):
            x, alpha = MultiHeadGATV2(
                units=u, num_heads=K,
                use_edge_features=cfg["use_edge_features"],
                activation=cfg["activation"], use_bias=cfg["use_bias"],
                name=f"att_{i}")(batch, x, ed)
            alphas.append(alpha)

        edge_importances = imp_act(sum(alphas))            # (E, K)
        edge_importances = edge_importances * batch.edge_mask[:, None].astype(
            edge_importances.dtype)

        # symmetric mean-pooling of edge importances over both directions
        pooled_in = pool_edges_to_nodes(batch, edge_importances, mode="mean")
        pooled_out = segment_ops_by_name(
            "mean", edge_importances, batch.senders, batch.n_node)
        pooled_edges = 0.5 * (pooled_out + pooled_in)

        ni = x
        imp_units = list(cfg["importance_units"]) + [K]
        imp_acts = ["relu"] * len(cfg["importance_units"]) + ["linear"]
        for li, (u, a) in enumerate(zip(imp_units, imp_acts)):
            ni = Dense(u, activation=a, use_bias=cfg["use_bias"],
                       name=f"node_imp_{li}")(ni)
        node_importances = imp_act(ni) * pooled_edges      # (N, K)

        outs = []
        for k in range(K):
            weighted = x * node_importances[:, k:k + 1]
            weighted = weighted * batch.node_mask[:, None].astype(x.dtype)
            outs.append(segment_ops_by_name(
                cfg["final_pooling"], weighted, batch.graph_id,
                batch.n_graphs, indices_are_sorted=True))
        out = jnp.concatenate(outs, axis=-1)               # (G, F*K)

        final_units = list(cfg["final_units"])
        final_acts = ["relu"] * (len(final_units) - 1) + [cfg["final_activation"]]
        for li, (u, a) in enumerate(zip(final_units, final_acts)):
            out = Dense(u, activation=a, use_bias=cfg["use_bias"],
                        name=f"final_{li}")(out)
        if cfg.get("regression_reference") is not None:
            out = out + cfg["regression_reference"]
        return {"output": out,
                "node_importances": node_importances,
                "edge_importances": edge_importances}


def make_model(**kwargs) -> MEGAN:
    cfg = update_model_kwargs(model_default, kwargs)
    return MEGAN(config=cfg)
