"""PAiNN equivariant message/update blocks.

Parity with ``kgcnn/layers/conv/painn_conv.py:12,129`` (behavior, not code).
Scalar features ``s (N, F)`` + equivariant features ``v (N, 3, F)``.
All contractions are batched matmuls over the feature axis — the 3-axis is
carried as a leading spatial axis so Dense maps hit the MXU with F x F
weights.
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from ...batch import GraphBatch
from ..aggr import (gather_nodes, gather_sender_nodes,
                    pool_edges_to_nodes)
from ..mlp import Dense

Array = jax.Array


class PAiNNconv(nn.Module):
    units: int = 128
    activation: Any = "swish"
    use_bias: bool = True
    conv_pool: str = "sum"
    cutoff: Optional[float] = None

    @nn.compact
    def __call__(self, batch: GraphBatch, s: Array, v: Array, rbf: Array,
                 envelope: Optional[Array], dir_ij: Array):
        """Returns (ds (N,F), dv (N,3,F))."""
        u = self.units
        phi = Dense(u, activation=self.activation, use_bias=self.use_bias,
                    name="dense_1")(s)
        phi = Dense(3 * u, activation="linear", use_bias=self.use_bias,
                    name="phi")(phi)
        phi_j = gather_sender_nodes(batch, phi)  # (E, 3U)
        w = Dense(3 * u, activation="linear", use_bias=self.use_bias,
                  name="w")(rbf)  # filter from radial basis
        if self.cutoff is not None and envelope is not None:
            w = w * envelope
        sw = phi_j * w
        sw1, sw2, sw3 = jnp.split(sw, 3, axis=-1)
        ds = pool_edges_to_nodes(batch, sw1, mode=self.conv_pool)
        vj = gather_sender_nodes(batch, v)  # (E, 3, F)
        dv_e = sw2[:, None, :] * vj + sw3[:, None, :] * dir_ij[:, :, None]
        dv = pool_edges_to_nodes(batch, dv_e, mode=self.conv_pool)
        return ds, dv


class PAiNNUpdate(nn.Module):
    units: int = 128
    activation: Any = "swish"
    use_bias: bool = True

    @nn.compact
    def __call__(self, batch: GraphBatch, s: Array, v: Array):
        u = self.units
        v_v = Dense(u, activation="linear", use_bias=False, name="lin_v")(v)
        v_u = Dense(u, activation="linear", use_bias=False, name="lin_u")(v)
        v_prod = jnp.sum(v_u * v_v, axis=1)  # (N, F) scalar product over xyz
        v_norm = jnp.sqrt(jnp.maximum(jnp.sum(v_v * v_v, axis=1), 1e-12))
        a = jnp.concatenate([s, v_norm], axis=-1)
        a = Dense(u, activation=self.activation, use_bias=self.use_bias,
                  name="dense_1")(a)
        a = Dense(3 * u, activation="linear", use_bias=self.use_bias,
                  name="a")(a)
        a_vv, a_sv, a_ss = jnp.split(a, 3, axis=-1)
        dv = a_vv[:, None, :] * v_u
        ds = v_prod * a_sv + a_ss
        return ds, dv


def equivariant_initialize(s: Array, dim: int = 3, method: str = "zeros",
                           value: float = 1.0) -> Array:
    """EquivariantInitialize (``painn_conv.py:228``): v0 of shape (N, dim, F)."""
    n, f = s.shape[0], s.shape[-1]
    if method == "zeros":
        return jnp.zeros((n, dim, f), dtype=s.dtype if jnp.issubdtype(s.dtype, jnp.floating) else jnp.float32)
    if method == "ones":
        return jnp.full((n, dim, f), value, dtype=jnp.float32)
    raise ValueError(f"unknown equivariant init {method}")
