"""Graph U-Net (parity: ``kgcnn/literature/Unet.py`` make_model; gPool layers
at ``kgcnn/layers/pool/topk.py:9,215,296``).

TPU design: the reference physically shrinks/regrows ragged graphs through
PoolingTopK / UnPoolingTopK and casts to dense for AdjacencyPower anyway
(``topk.py:296`` "casts to dense until sparse matmul is supported"). Here the
whole U runs on a static padded per-graph form — nodes ``(G, M, F)`` and a
weighted adjacency ``(G, M, M)`` — so every step is one batched matmul on
the MXU and jit-compilable:

- GCN step = Dense on nodes, presence-masked row-MEAN over senders
  (GatherNodesOutgoing + PoolingLocalEdges('segment_mean'), Unet.py:119-122).
- reconnect = ``A @ A`` with entries kept above keras epsilon
  (AdjacencyPower, topk.py:358-368).
- gPool = score ``n . p / ||p||``, REMOVE round(k*N) lowest-scoring nodes
  per graph, gate survivors by sigmoid(score) (topk.py:85-119,228); pooled
  adjacency = rows/cols of survivors. Removed nodes stay as zeroed slots —
  numerically identical to physical removal for every downstream op.
- unpool + skip = survivors' features land back in their original slots
  (zeros elsewhere) and add to the stored skip (UnPoolingTopK + LazyAdd,
  Unet.py:140-143).

Full-model golden parity: tests/test_reference_parity.py::test_unet.
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..batch import GraphBatch, flat_to_padded
from ..layers.mlp import Dense, MLP
from .common import OptionalInputEmbedding
from .registry import update_model_kwargs

Array = jax.Array

_EPS = 1e-7  # tf.keras.backend.epsilon(), AdjacencyPower threshold

model_default = dict(
    input_embedding={"node": {"input_dim": 95, "output_dim": 64},
                     "edge": {"input_dim": 5, "output_dim": 64}},
    hidden_dim={"units": 32, "use_bias": True, "activation": "linear"},
    top_k_args={"k": 0.3, "kernel_initializer": "ones"},
    activation="relu",
    use_reconnect=True,
    depth=4,
    pooling_args={"pooling_method": "mean"},
    gather_args={},
    output_embedding="graph",
    output_mlp={"use_bias": [True, False], "units": [25, 1],
                "activation": ["relu", "sigmoid"]},
)


def _gcn(n: Array, adj: Array, dense: Dense, act) -> Array:
    """Gather senders -> Dense -> mean over present edges per receiver.

    ``adj[g, i, j] != 0`` marks an edge with receiver i, sender j; matches
    PoolingLocalEdges(pooling_method='segment_mean') + scatter-to-zero for
    receivers without edges (kgcnn/layers/pooling.py:37-79)."""
    h = dense(n)  # (G, M, F)
    presence = (adj != 0).astype(h.dtype)
    count = jnp.sum(presence, axis=-1, keepdims=True)  # (G, M, 1)
    summed = jnp.einsum("gij,gjf->gif", presence, h)
    return act(jnp.where(count > 0, summed / jnp.maximum(count, 1.0), 0.0))


class GraphUnet(nn.Module):
    config: Dict[str, Any]

    @nn.compact
    def __call__(self, batch: GraphBatch, train: bool = False) -> Dict[str, Array]:
        cfg = self.config
        from ..ops.activ import get_activation
        act = get_activation(cfg["activation"])
        k = cfg["top_k_args"].get("k", 0.1)
        score_init = nn.initializers.ones \
            if cfg["top_k_args"].get("kernel_initializer", "ones") == "ones" \
            else nn.initializers.glorot_uniform()
        hid = cfg["hidden_dim"]

        x = batch.nodes.get("node_attributes", batch.nodes.get("node_number"))
        n_flat = OptionalInputEmbedding(**cfg["input_embedding"]["node"])(x)
        ed_flat = batch.edges.get("edge_attributes",
                                  batch.edges.get("edge_weights"))
        if ed_flat is None:
            ew_flat = batch.edge_mask.astype(n_flat.dtype)
        else:
            if ed_flat.ndim == 1:
                ed_flat = OptionalInputEmbedding(
                    **cfg["input_embedding"]["edge"])(ed_flat)
            ew_flat = ed_flat.reshape(ed_flat.shape[0], -1)[:, 0]
        ew_flat = ew_flat * batch.edge_mask.astype(ew_flat.dtype)

        # padded per-graph form
        G, M = batch.n_graphs, max(batch.max_nodes, 1)
        n = flat_to_padded(n_flat, batch)  # (G, M, F)
        valid = flat_to_padded(
            batch.node_mask[:, None].astype(n.dtype), batch)[..., 0]  # (G, M)
        gid = batch.edge_graph_id
        ri = jnp.minimum(batch.node_loc[batch.receivers], M - 1)
        si = jnp.minimum(batch.node_loc[batch.senders], M - 1)
        adj = jnp.zeros((G, M, M), dtype=n.dtype)
        adj = adj.at[gid, ri, si].set(ew_flat)

        n = Dense(hid["units"], activation=hid["activation"],
                  use_bias=hid["use_bias"], name="proj")(n)

        skip_n = [n]
        skip_adj = [adj]
        cur_n, cur_adj, cur_mask = n, adj, valid
        depth = cfg["depth"]
        for i in range(depth):
            cur_n = _gcn(cur_n, cur_adj,
                         Dense(hid["units"], activation=hid["activation"],
                               use_bias=hid["use_bias"], name=f"down_{i}"),
                         act)
            if cfg["use_reconnect"]:
                a2 = jnp.einsum("gij,gjk->gik", cur_adj, cur_adj)
                cur_adj = jnp.where(a2 > _EPS, a2, 0.0)
            # gPool: remove round(k*N) lowest scores among current nodes
            p = self.param(f"topk_{i}_score", score_init, (1, hid["units"]))
            p_norm = jnp.sqrt(jnp.sum(p * p))
            score = jnp.sum(cur_n * p[0][None, None, :], axis=-1) / \
                jnp.maximum(p_norm, 1e-12)  # (G, M)
            num = jnp.sum(cur_mask, axis=1)  # (G,)
            n_remove = jnp.round(k * num)
            # ascending rank among valid nodes; invalid slots rank last
            big = jnp.where(cur_mask > 0, score, jnp.inf)
            lower = (big[:, None, :] < big[:, :, None]) | (
                (big[:, None, :] == big[:, :, None])
                & (jnp.arange(M)[None, None, :] < jnp.arange(M)[None, :, None]))
            rank = jnp.sum(lower & (cur_mask[:, None, :] > 0), axis=-1)
            keep = (rank >= n_remove[:, None]).astype(cur_n.dtype) * cur_mask
            gate = jax.nn.sigmoid(score)
            cur_n = cur_n * (gate * keep)[..., None]
            cur_adj = cur_adj * keep[:, :, None] * keep[:, None, :]
            cur_mask = keep
            skip_n.append(cur_n)
            skip_adj.append(cur_adj)

        for i in range(depth, 0, -1):
            # unpool is identity on slots (survivors keep their positions);
            # skip-add the stored pre-GCN nodes of the level below
            cur_n = cur_n + skip_n[i - 1]
            cur_n = _gcn(cur_n, skip_adj[i - 1],
                         Dense(hid["units"], activation=hid["activation"],
                               use_bias=hid["use_bias"], name=f"up_{i - 1}"),
                         act)

        if cfg["output_embedding"] == "graph":
            cur_n = cur_n * valid[..., None]
            tot = jnp.sum(cur_n, axis=1)
            cnt = jnp.maximum(jnp.sum(valid, axis=1), 1.0)[:, None]
            out = tot / cnt  # PoolingNodes 'segment_mean' readout
            out = MLP(cfg["output_mlp"]["units"],
                      activation=cfg["output_mlp"]["activation"],
                      use_bias=cfg["output_mlp"].get("use_bias", True),
                      name="out_mlp")(out)
        else:
            from ..batch import padded_to_flat
            flat = padded_to_flat(cur_n, batch)
            out = MLP(cfg["output_mlp"]["units"],
                      activation=cfg["output_mlp"]["activation"],
                      use_bias=cfg["output_mlp"].get("use_bias", True),
                      name="out_mlp")(flat)
        return {"output": out}


def make_model(**kwargs) -> GraphUnet:
    cfg = update_model_kwargs(model_default, kwargs)
    return GraphUnet(config=cfg)
