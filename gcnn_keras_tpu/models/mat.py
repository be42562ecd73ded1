"""MAT — Molecule Attention Transformer (parity: ``kgcnn/literature/MAT.py``;
layers at ``kgcnn/layers/conv/mat_conv.py:32,110``): dense self-attention on
PADDED per-graph tensors with adjacency- and distance-matrix attention
biases (lambda-weighted), like the reference's padded (non-ragged) design —
which maps directly onto the MXU."""
from __future__ import annotations

import math
from typing import Any, Dict

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..batch import GraphBatch, flat_to_padded, padded_to_flat
from ..layers.mlp import MLP
from .common import OptionalInputEmbedding
from .registry import update_model_kwargs

Array = jax.Array

model_default = dict(
    input_embedding={"node": {"input_dim": 95, "output_dim": 64}},
    distance_matrix_kwargs={"trafo": "exp"},
    attention_kwargs={"units": 64, "lambda_attention": 0.3,
                      "lambda_distance": 0.3, "num_heads": 8},
    feed_forward_kwargs={"units": [64, 64], "activation": ["relu", "linear"]},
    embedding_units=64,
    depth=5,
    heads=8,
    merge_heads="concat",
    verbose=10,
    pooling_kwargs={"pooling_method": "sum"},
    output_embedding="graph",
    output_mlp={"units": [25, 1], "activation": ["relu", "linear"]},
)


class MATAttention(nn.Module):
    """mat_conv.py:110 — attention with molecule structure biases:
    softmax(QK/sqrt d) weighted by lambda_att + adjacency*lambda_adj +
    distance*lambda_dist."""

    units: int
    num_heads: int = 8
    lambda_attention: float = 0.3
    lambda_distance: float = 0.3

    @nn.compact
    def __call__(self, x: Array, mask: Array, adj: Array, dist: Array) -> Array:
        # x (G, M, F); mask (G, M); adj/dist (G, M, M)
        H, U = self.num_heads, self.units
        d_head = max(U // H, 1)
        q = nn.DenseGeneral((H, d_head), name="q")(x)
        k = nn.DenseGeneral((H, d_head), name="k")(x)
        v = nn.DenseGeneral((H, d_head), name="v")(x)
        logits = jnp.einsum("gihd,gjhd->ghij", q, k) / math.sqrt(d_head)
        neg = jnp.asarray(-1e9, logits.dtype)
        m2 = mask[:, None, None, :]
        logits = jnp.where(m2 > 0, logits, neg)
        att = jax.nn.softmax(logits, axis=-1)
        lam_adj = 1.0 - self.lambda_attention - self.lambda_distance
        # normalize adjacency / distance rows to combine with attention
        adj_n = adj / jnp.maximum(jnp.sum(adj, axis=-1, keepdims=True), 1e-6)
        dist_n = dist / jnp.maximum(jnp.sum(dist, axis=-1, keepdims=True), 1e-6)
        combined = (self.lambda_attention * att
                    + lam_adj * adj_n[:, None]
                    + self.lambda_distance * dist_n[:, None])
        out = jnp.einsum("ghij,gjhd->gihd", combined, v)
        out = out.reshape(out.shape[0], out.shape[1], H * d_head)
        return nn.Dense(U, name="o")(out)


class MAT(nn.Module):
    config: Dict[str, Any]

    @nn.compact
    def __call__(self, batch: GraphBatch, train: bool = False) -> Dict[str, Array]:
        cfg = self.config
        u = cfg["embedding_units"]
        x = batch.nodes.get("node_attributes", batch.nodes.get("node_number"))
        h = OptionalInputEmbedding(**cfg["input_embedding"]["node"])(x)
        h = nn.Dense(u, name="proj")(h)

        hp = flat_to_padded(h, batch)               # (G, M, F)
        mask = flat_to_padded(batch.node_mask.astype(h.dtype), batch)  # (G, M)
        xyz = flat_to_padded(batch.nodes["node_coordinates"], batch) \
            if "node_coordinates" in batch.nodes else None

        G, M = hp.shape[0], hp.shape[1]
        # dense adjacency from the edge list
        adj = jnp.zeros((G, M, M), dtype=h.dtype)
        ri = jnp.minimum(batch.node_loc[batch.receivers], M - 1)
        si = jnp.minimum(batch.node_loc[batch.senders], M - 1)
        w = batch.edge_mask.astype(h.dtype)
        adj = adj.at[batch.edge_graph_id, ri, si].add(w)
        # distance matrix (exp transform like the reference default)
        if xyz is not None:
            diff = xyz[:, :, None, :] - xyz[:, None, :, :]
            dmat = jnp.sqrt(jnp.maximum(jnp.sum(diff * diff, axis=-1), 1e-12))
            if cfg["distance_matrix_kwargs"].get("trafo") == "exp":
                dmat = jnp.exp(-dmat)
            pair_mask = mask[:, :, None] * mask[:, None, :]
            dmat = dmat * pair_mask
        else:
            dmat = adj

        for i in range(cfg["depth"]):
            a = MATAttention(units=u,
                             num_heads=cfg["attention_kwargs"]["num_heads"],
                             lambda_attention=cfg["attention_kwargs"]["lambda_attention"],
                             lambda_distance=cfg["attention_kwargs"]["lambda_distance"],
                             name=f"att_{i}")(hp, mask, adj, dmat)
            hp = nn.LayerNorm(name=f"ln1_{i}")(hp + a)
            ff = MLP(cfg["feed_forward_kwargs"]["units"],
                     activation=cfg["feed_forward_kwargs"]["activation"],
                     name=f"ff_{i}")(hp)
            hp = nn.LayerNorm(name=f"ln2_{i}")(hp + ff)

        hp = hp * mask[..., None]
        if cfg["output_embedding"] == "graph":
            mode = cfg["pooling_kwargs"]["pooling_method"]
            pooled = jnp.sum(hp, axis=1)
            if mode == "mean":
                pooled = pooled / jnp.maximum(jnp.sum(mask, axis=1, keepdims=True), 1.0)
            out = MLP(cfg["output_mlp"]["units"],
                      activation=cfg["output_mlp"]["activation"], name="out_mlp")(pooled)
        else:
            flat = padded_to_flat(hp, batch)
            out = MLP(cfg["output_mlp"]["units"],
                      activation=cfg["output_mlp"]["activation"], name="out_mlp")(flat)
        return {"output": out}


def make_model(**kwargs) -> MAT:
    cfg = update_model_kwargs(model_default, kwargs)
    return MAT(config=cfg)
