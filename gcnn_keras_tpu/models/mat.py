"""MAT — Molecule Attention Transformer (parity: ``kgcnn/literature/MAT.py:113-200``;
layers at ``kgcnn/layers/conv/mat_conv.py:32,110``): pre-norm transformer on
PADDED per-graph tensors whose attention matrix is a lambda-weighted mix of
per-feature self-attention, an exp(-d^2) distance matrix and the (feature-
projected) adjacency matrix — the reference's padded (non-ragged) design,
which maps directly onto the MXU.

Faithful details (all from ``mat_conv.py``):

- ``MATDistanceMatrix`` uses SQUARED distances, ``exp`` trafo adds 1/eps
  (1e7) to masked entries before ``exp(-d2)`` and re-masks after.
- ``MATAttentionHead`` attention is per feature channel:
  ``qk[g,i,j,f] = q[g,i,f] * k[g,j,f] / units**-0.5`` (the reference
  divides by the scale, i.e. multiplies by sqrt(units) — kept for parity),
  masked softmax over ``j``, then
  ``att = la*qk + ld*dist + ladj*adj`` and
  ``out[g,i,f] = sum_j att[g,i,j,f] v[g,j,f]``.
- Heads are independent layers merged by concat (or sum) followed by a
  bias-free Dense to ``embedding_units``; residuals are pre-norm.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..batch import GraphBatch, flat_to_padded
from ..layers.mlp import MLP
from .common import OptionalInputEmbedding
from .registry import update_model_kwargs

Array = jax.Array

model_default = dict(
    name="MAT",
    input_embedding={"node": {"input_dim": 95, "output_dim": 64},
                     "edge": {"input_dim": 95, "output_dim": 64}},
    use_edge_embedding=False,
    max_atoms=None,
    distance_matrix_kwargs={"trafo": "exp"},
    attention_kwargs={"units": 8, "lambda_attention": 0.3,
                      "lambda_distance": 0.3, "lambda_adjacency": None,
                      "dropout": 0.1, "add_identity": False},
    feed_forward_kwargs={"units": [32, 32, 32],
                         "activation": ["relu", "relu", "linear"]},
    embedding_units=32,
    depth=5,
    heads=8,
    merge_heads="concat",
    verbose=10,
    pooling_kwargs={"pooling_method": "sum"},
    output_embedding="graph",
    output_to_tensor=True,
    output_mlp={"use_bias": [True, True, True], "units": [32, 16, 1],
                "activation": ["relu", "relu", "linear"]},
)

_EPS_INV = 1e7  # 1 / keras.backend.epsilon()


def mat_distance_matrix(xyz: Array, pair_mask: Array,
                        trafo: Optional[str] = "exp") -> Array:
    """``MATDistanceMatrix`` (mat_conv.py:32): squared distances with
    exp/softmax transform. ``xyz (G,M,3)``, ``pair_mask (G,M,M,1)``."""
    diff = xyz[:, None, :, :] - xyz[:, :, None, :]
    dist = jnp.sum(diff * diff, axis=-1, keepdims=True)  # (G, M, M, 1)
    if trafo == "exp":
        dist = dist + jnp.where(pair_mask > 0, 0.0, _EPS_INV)
        dist = jnp.exp(-dist)
    elif trafo == "softmax":
        dist = dist + jnp.where(pair_mask > 0, 0.0, -_EPS_INV)
        dist = jax.nn.softmax(dist, axis=2)
    return dist * pair_mask


class MATAttentionHead(nn.Module):
    """mat_conv.py:110 — one per-feature-channel attention head."""

    units: int = 8
    lambda_attention: float = 0.3
    lambda_distance: float = 0.3
    lambda_adjacency: Optional[float] = None
    add_identity: bool = False

    @nn.compact
    def __call__(self, h: Array, dist: Array, adj: Array,
                 h_mask: Array) -> Array:
        lam_adj = (self.lambda_adjacency if self.lambda_adjacency is not None
                   else 1.0 - self.lambda_attention - self.lambda_distance)
        q = nn.Dense(self.units, name="dense_q")(h)
        k = nn.Dense(self.units, name="dense_k")(h)
        v = nn.Dense(self.units, name="dense_v")(h) * h_mask
        # (G, M_i, M_j, F); reference divides by scale = units**-0.5
        qk = q[:, :, None, :] * k[:, None, :, :] / (self.units ** -0.5)
        qk_mask = h_mask[:, None, :, :] * h_mask[:, :, None, :]
        qk = qk + jnp.where(qk_mask > 0, 0.0, -_EPS_INV)
        qk = jax.nn.softmax(qk, axis=2) * qk_mask
        if self.add_identity:
            eye = jnp.eye(adj.shape[1], dtype=adj.dtype)[None, :, :, None]
            adj = adj + eye
        att = (self.lambda_attention * qk + self.lambda_distance * dist
               + lam_adj * adj)
        hp = jnp.einsum("gijf,gjf->gif", att, v)
        return hp * h_mask


class MAT(nn.Module):
    config: Dict[str, Any]

    @nn.compact
    def __call__(self, batch: GraphBatch, train: bool = False) -> Dict[str, Array]:
        cfg = self.config
        u = cfg["embedding_units"]
        att_kwargs = dict(cfg["attention_kwargs"])
        att_kwargs.pop("dropout", None)
        heads = att_kwargs.pop("num_heads", None) or cfg["heads"]

        x = batch.nodes.get("node_attributes", batch.nodes.get("node_number"))
        nd = OptionalInputEmbedding(**cfg["input_embedding"]["node"],
                                    name="node_embed")(x)

        n = flat_to_padded(nd, batch)                      # (G, M, F)
        mask = flat_to_padded(
            batch.node_mask.astype(n.dtype), batch)        # (G, M)
        h_mask = mask[:, :, None]                          # (G, M, 1)
        pair_mask = h_mask[:, None, :, :] * h_mask[:, :, None, :]

        G, M = n.shape[0], n.shape[1]
        if "node_coordinates" in batch.nodes:
            xyz = flat_to_padded(batch.nodes["node_coordinates"], batch)
            dist = mat_distance_matrix(
                xyz, pair_mask, **cfg["distance_matrix_kwargs"])
        else:
            dist = jnp.zeros((G, M, M, 1), dtype=n.dtype)

        # dense adjacency from the edge list, carrying edge features
        # (CastEdgeIndicesToDenseAdjacency, casting.py:106; duplicate edges add)
        ew = batch.edges.get("edge_weights",
                             batch.edges.get("edge_attributes"))
        if ew is None:
            ew = batch.edge_mask.astype(n.dtype)[:, None]
        elif ew.ndim == 1:
            ew = ew[:, None]
        ew = ew * batch.edge_mask.astype(ew.dtype)[:, None]
        ri = jnp.minimum(batch.node_loc[batch.receivers], M - 1)
        si = jnp.minimum(batch.node_loc[batch.senders], M - 1)
        adj = jnp.zeros((G, M, M, ew.shape[-1]), dtype=n.dtype)
        adj = adj.at[batch.edge_graph_id, ri, si].add(
            ew * batch.edge_mask.astype(ew.dtype)[:, None])
        # feature-wise attention not desired for adjacency (MAT.py:150)
        adj = nn.Dense(1, use_bias=False, name="adj_proj")(adj)

        h = nn.Dense(u, use_bias=False, name="proj")(n)
        for i in range(cfg["depth"]):
            hn = nn.LayerNorm(epsilon=1e-3, name=f"ln1_{i}")(h)
            hs = [MATAttentionHead(**att_kwargs, name=f"att_{i}_{j}")(
                hn, dist, adj, h_mask) for j in range(heads)]
            if cfg["merge_heads"] in ("add", "sum", "reduce_sum"):
                hu = sum(hs)
            else:
                hu = jnp.concatenate(hs, axis=-1)
            hu = nn.Dense(u, use_bias=False, name=f"merge_{i}")(hu)
            h = h + hu
            hn = nn.LayerNorm(epsilon=1e-3, name=f"ln2_{i}")(h)
            hu = MLP(cfg["feed_forward_kwargs"]["units"],
                     activation=cfg["feed_forward_kwargs"]["activation"],
                     name=f"ff_{i}")(hn)
            hu = nn.Dense(u, use_bias=False, name=f"ff_proj_{i}")(hu)
            h = h + hu * h_mask

        out = nn.LayerNorm(epsilon=1e-3, name="ln_out")(h)
        units = cfg["output_mlp"]["units"]
        use_bias = cfg["output_mlp"].get("use_bias", True)
        if isinstance(use_bias, (list, tuple)) and len(use_bias) != len(units):
            use_bias = True
        if cfg["output_embedding"] == "graph":
            out = out * h_mask
            out = jnp.sum(out, axis=1)                     # MATGlobalPool sum
            out = MLP(units, activation=cfg["output_mlp"]["activation"],
                      use_bias=use_bias, name="out_mlp")(out)
        else:
            out = MLP(units, activation=cfg["output_mlp"]["activation"],
                      use_bias=use_bias, name="out_mlp")(out) * h_mask
        return {"output": out}


def make_model(**kwargs) -> MAT:
    cfg = update_model_kwargs(model_default, kwargs)
    return MAT(config=cfg)
