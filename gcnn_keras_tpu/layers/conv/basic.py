"""Generic GNN conv blocks: GIN/GINE, GAT/GATv2, GRU update, relational GCN.

Parity (behavior): ``kgcnn/layers/conv/gin_conv.py:10,81``,
``gat_conv.py:10,120,232``, ``mpnn_conv.py:69,111``, and R-GCN via
``layers/relational.py``-style per-relation dense.
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from ...batch import GraphBatch
from ..aggr import (
    gather_nodes, gather_sender_nodes, pool_edges_to_nodes,
    pool_edges_to_nodes_attention,
)
from ..mlp import Dense
from ...ops.activ import get_activation

Array = jax.Array


class GIN(nn.Module):
    """h_i' = (1+eps) h_i + sum_j h_j (phi applied outside, gin_conv.py:10)."""

    pooling_method: str = "sum"
    epsilon_learnable: bool = False

    @nn.compact
    def __call__(self, batch: GraphBatch, nodes: Array) -> Array:
        eps = self.param("epsilon_k", nn.initializers.zeros, ()) \
            if self.epsilon_learnable else 0.0
        hj = gather_sender_nodes(batch, nodes)
        agg = pool_edges_to_nodes(batch, hj, mode=self.pooling_method)
        return (1.0 + eps) * nodes + agg


class GINE(nn.Module):
    """GIN with edge features: sum_j act(h_j + e_ij) (gin_conv.py:81)."""

    pooling_method: str = "sum"
    epsilon_learnable: bool = False
    activation: Any = "relu"

    @nn.compact
    def __call__(self, batch: GraphBatch, nodes: Array, edges: Array) -> Array:
        eps = self.param("epsilon_k", nn.initializers.zeros, ()) \
            if self.epsilon_learnable else 0.0
        hj = gather_sender_nodes(batch, nodes)
        msg = get_activation(self.activation)(hj + edges)
        agg = pool_edges_to_nodes(batch, msg, mode=self.pooling_method)
        return (1.0 + eps) * nodes + agg


class AttentionHeadGAT(nn.Module):
    """GAT head (gat_conv.py:10): a_ij = act(a^T [W n_i || W n_j (|| e_ij)]),
    alpha = softmax_j, m_i = sum alpha W n_j."""

    units: int
    use_edge_features: bool = False
    use_final_activation: bool = True
    activation: Any = "leaky_relu"
    use_bias: bool = True

    @nn.compact
    def __call__(self, batch: GraphBatch, nodes: Array,
                 edges: Optional[Array] = None) -> Array:
        wn = Dense(self.units, activation="linear", use_bias=self.use_bias,
                   name="linear_trafo")(nodes)
        wn_in = gather_nodes(wn, batch.receivers)
        wn_out = gather_sender_nodes(batch, wn)
        feats = [wn_in, wn_out]
        if self.use_edge_features and edges is not None:
            feats.append(edges)
        e_ij = jnp.concatenate(feats, axis=-1)
        a_ij = Dense(1, activation=self.activation, use_bias=False,
                     name="alpha")(e_ij)
        h = pool_edges_to_nodes_attention(batch, wn_out, a_ij)
        if self.use_final_activation:
            h = get_activation(self.activation)(h)
        return h


class AttentionHeadGATV2(nn.Module):
    """GATv2 head (gat_conv.py:120): a_ij = a^T act(W [n_i || n_j (|| e_ij)])."""

    units: int
    use_edge_features: bool = False
    use_final_activation: bool = True
    activation: Any = "leaky_relu"
    use_bias: bool = True

    @nn.compact
    def __call__(self, batch: GraphBatch, nodes: Array,
                 edges: Optional[Array] = None) -> Array:
        wn = Dense(self.units, activation="linear", use_bias=self.use_bias,
                   name="linear_trafo")(nodes)
        n_in = gather_nodes(nodes, batch.receivers)
        n_out = gather_sender_nodes(batch, nodes)
        wn_out = gather_sender_nodes(batch, wn)
        feats = [n_in, n_out]
        if self.use_edge_features and edges is not None:
            feats.append(edges)
        e_ij = jnp.concatenate(feats, axis=-1)
        a_ij = Dense(self.units, activation=self.activation,
                     use_bias=self.use_bias, name="alpha_activation")(e_ij)
        a_ij = Dense(1, activation="linear", use_bias=False, name="alpha")(a_ij)
        h = pool_edges_to_nodes_attention(batch, wn_out, a_ij)
        if self.use_final_activation:
            h = get_activation(self.activation)(h)
        return h


class MultiHeadGATV2(nn.Module):
    """Multi-head GATv2 (gat_conv.py:232) with concat or average merge."""

    units: int
    num_heads: int = 4
    use_edge_features: bool = True
    concat_heads: bool = True
    activation: Any = "leaky_relu"
    use_bias: bool = True

    @nn.compact
    def __call__(self, batch: GraphBatch, nodes: Array,
                 edges: Optional[Array] = None) -> Array:
        heads = [
            AttentionHeadGATV2(self.units, use_edge_features=self.use_edge_features,
                               activation=self.activation, use_bias=self.use_bias,
                               use_final_activation=False,
                               name=f"head_{i}")(batch, nodes, edges)
            for i in range(self.num_heads)
        ]
        if self.concat_heads:
            out = jnp.concatenate(heads, axis=-1)
        else:
            out = sum(heads) / self.num_heads
        return get_activation(self.activation)(out)


class GRUUpdate(nn.Module):
    """GRU cell node update (mpnn_conv.py:111): state=nodes, input=agg msg."""

    units: int

    @nn.compact
    def __call__(self, nodes: Array, messages: Array) -> Array:
        new_state, _ = nn.GRUCell(features=self.units)(nodes, messages)
        return new_state


def matmul_messages(trafo: Array, edges: Array) -> Array:
    """Per-edge matrix multiply (mpnn_conv.py:69): (E, F', F) @ (E, F)."""
    return jnp.einsum("euf,ef->eu", trafo, edges)


class RelationalGCNConv(nn.Module):
    """R-GCN conv: h_i' = act(W0 h_i + sum_r sum_{j in N_r} 1/c W_r h_j)
    (``kgcnn/literature/RGCN.py`` + ``layers/relational.py:9``)."""

    units: int
    num_relations: int
    activation: Any = "relu"
    use_bias: bool = True

    @nn.compact
    def __call__(self, batch: GraphBatch, nodes: Array,
                 edge_relations: Array, edge_weights: Optional[Array] = None) -> Array:
        from ..mlp import RelationalDense
        self_msg = Dense(self.units, activation="linear", use_bias=self.use_bias,
                         name="self_dense")(nodes)
        hj = gather_sender_nodes(batch, nodes)
        # the reference RelationalDense carries a (shared) bias
        # (layers/relational.py Dense defaults)
        rel_msg = RelationalDense(self.units, self.num_relations,
                                  activation="linear", use_bias=self.use_bias,
                                  name="rel_dense")(hj, edge_relations)
        if edge_weights is not None:
            w = edge_weights.reshape(edge_weights.shape[0], -1)[:, :1]
            rel_msg = rel_msg * w
        agg = pool_edges_to_nodes(batch, rel_msg, mode="sum")
        return get_activation(self.activation)(self_msg + agg)


class KerasGRUSequencePooling(nn.Module):
    """Graph readout via a GRU run over each graph's node sequence,
    returning the final hidden state per graph — the reference CMPNN's
    ``ks.layers.GRU(**pooling_gru)`` readout over the ragged node tensor
    (``kgcnn/literature/CMPNN.py``). Implements keras GRU math exactly
    (reset_after=True, tanh/sigmoid): kernel (F, 3U) [z|r|h], recurrent
    kernel (U, 3U), bias (2, 3U) = [input, recurrent].

    TPU note: a scan over N_max steps of (G, F) matmuls; fine for readout
    (called once per model), not for per-edge work.
    """

    units: int

    @nn.compact
    def __call__(self, batch, nodes: Array) -> Array:
        from ...batch import flat_to_padded
        u = self.units
        f = nodes.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (f, 3 * u))
        rec_kernel = self.param("recurrent_kernel",
                                nn.initializers.orthogonal(), (u, 3 * u))
        bias = self.param("bias", nn.initializers.zeros, (2, 3 * u))

        x_pad = flat_to_padded(nodes, batch)         # (G, N_max, F)
        mask = flat_to_padded(
            batch.node_mask.astype(nodes.dtype), batch)  # (G, N_max)
        xw = x_pad @ kernel + bias[0]                # (G, N_max, 3U)

        def step(h, inp):
            xw_t, m_t = inp                          # (G, 3U), (G,)
            rw = h @ rec_kernel + bias[1]            # (G, 3U)
            xz, xr, xh = jnp.split(xw_t, 3, axis=-1)
            rz, rr, rh = jnp.split(rw, 3, axis=-1)
            z = jax.nn.sigmoid(xz + rz)
            r = jax.nn.sigmoid(xr + rr)
            hh = jnp.tanh(xh + r * rh)
            h_new = z * h + (1.0 - z) * hh
            m = m_t[:, None].astype(h.dtype)
            return h * (1 - m) + h_new * m, None

        h0 = jnp.zeros((x_pad.shape[0], u), dtype=nodes.dtype)
        h_final, _ = jax.lax.scan(step, h0,
                                  (jnp.swapaxes(xw, 0, 1),
                                   jnp.swapaxes(mask, 0, 1)))
        return h_final


class KerasGRUCellUpdate(nn.Module):
    """Single keras-GRUCell step for node updates (parity: the reference
    ``GRUUpdate`` wraps ``ks.layers.GRUCell``, ``mpnn_conv.py:111``), with
    keras weight layout for golden parity: kernel (F_in, 3U) [z|r|h],
    recurrent kernel (U, 3U), bias (2, 3U) [input, recurrent]
    (reset_after=True)."""

    units: int

    @nn.compact
    def __call__(self, state: Array, inputs: Array) -> Array:
        u = self.units
        f = inputs.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(), (f, 3 * u))
        rec_kernel = self.param("recurrent_kernel",
                                nn.initializers.orthogonal(), (u, 3 * u))
        bias = self.param("bias", nn.initializers.zeros, (2, 3 * u))
        xw = inputs @ kernel + bias[0]
        rw = state @ rec_kernel + bias[1]
        xz, xr, xh = jnp.split(xw, 3, axis=-1)
        rz, rr, rh = jnp.split(rw, 3, axis=-1)
        z = jax.nn.sigmoid(xz + rz)
        r = jax.nn.sigmoid(xr + rr)
        hh = jnp.tanh(xh + r * rh)
        return z * state + (1.0 - z) * hh
