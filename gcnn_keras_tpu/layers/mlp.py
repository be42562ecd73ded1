"""Dense / MLP / per-relation MLP modules (flax.linen).

Replaces ``kgcnn/layers/modules.py`` (DenseEmbedding) + ``kgcnn/layers/mlp.py``
(MLP, GraphMLP, RelationalMLP) + ``kgcnn/layers/relational.py``
(RelationalDense). Ragged wrappers are unnecessary: flat node/edge arrays are
ordinary ``(N, F)`` matrices that map straight onto the MXU.
"""
from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops.activ import get_activation

Array = jax.Array


def _as_list(v, depth: int):
    if isinstance(v, (list, tuple)):
        assert len(v) == depth, f"list length {len(v)} != depth {depth}"
        return list(v)
    return [v] * depth


class Dense(nn.Module):
    """Dense layer with named activation (DenseEmbedding, modules.py:90).

    ``dtype``: computation dtype (e.g. jnp.bfloat16 for MXU-friendly mixed
    precision); params stay float32. None = input dtype.
    """

    units: int
    activation: Any = "linear"
    use_bias: bool = True
    kernel_init: Any = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        # keras Dense default is glorot_uniform (flax's is lecun_normal);
        # matching it keeps TRAINING dynamics aligned with the reference,
        # not just the forward math — measured in tools/headtohead.
        init = self.kernel_init or nn.initializers.glorot_uniform()
        y = nn.Dense(self.units, use_bias=self.use_bias, kernel_init=init,
                     dtype=self.dtype, param_dtype=jnp.float32)(x)
        return get_activation(self.activation)(y)


class MLP(nn.Module):
    """Multi-layer perceptron with per-layer unit/activation lists
    (``kgcnn/layers/mlp.py:246``). ``units`` may be an int or list.

    With ``use_normalization``, each layer applies dense -> normalization ->
    activation in the reference's order (``kgcnn/layers/mlp.py`` call);
    ``graph_batch`` normalization needs the valid-row ``mask`` argument.
    """

    units: Union[int, Sequence[int]]
    activation: Any = "linear"
    use_bias: Any = True
    last_linear: bool = False
    use_normalization: Any = False
    normalization_technique: str = "graph_batch"

    @nn.compact
    def __call__(self, x: Array, mask: Optional[Array] = None,
                 train: bool = False) -> Array:
        units = self.units if isinstance(self.units, (list, tuple)) else [self.units]
        depth = len(units)
        acts = _as_list(self.activation, depth)
        biases = _as_list(self.use_bias, depth)
        norms = _as_list(self.use_normalization, depth)
        for i, (u, a, b, nrm) in enumerate(zip(units, acts, biases, norms)):
            if self.last_linear and i == depth - 1:
                a = "linear"
            if not nrm:
                x = Dense(u, activation=a, use_bias=b, name=f"dense_{i}")(x)
                continue
            x = Dense(u, activation="linear", use_bias=b, name=f"dense_{i}")(x)
            if self.normalization_technique in ("graph_batch", "batch"):
                from .norm import GraphBatchNorm
                x = GraphBatchNorm(name=f"norm_{i}")(
                    x, mask, use_running_average=not train)
            else:
                from .norm import GraphLayerNorm
                x = GraphLayerNorm(name=f"norm_{i}")(x)
            from ..ops.activ import get_activation
            x = get_activation(a)(x)
        return x


GraphMLP = MLP


class RelationalDense(nn.Module):
    """Per-relation dense: one weight set per relation (element type),
    selected per row (``kgcnn/layers/relational.py:9``).

    TPU design: instead of gathering per-row weight matrices (bad for MXU),
    compute ``x @ W_r`` for all R relations as one einsum ``(N,Fi),(R,Fi,Fo)
    -> (N,R,Fo)`` and select with a one-hot contraction when R is small
    (R = num chemical elements, typically <= 8), which keeps everything as
    large matmuls. For large R, falls back to gathered weights.
    """

    units: int
    num_relations: int
    activation: Any = "linear"
    use_bias: bool = True
    dense_relation_threshold: int = 16

    @nn.compact
    def __call__(self, x: Array, relations: Array) -> Array:
        fi = x.shape[-1]
        # glorot over the (fi, units) fans per relation, like the reference
        # RelationalDense (keras glorot_uniform default)
        w = self.param("kernel",
                       nn.initializers.glorot_uniform(in_axis=-2, out_axis=-1),
                       (self.num_relations, fi, self.units))
        b = self.param("bias", nn.initializers.zeros,
                       (self.num_relations, self.units)) if self.use_bias else None
        if self.num_relations <= self.dense_relation_threshold:
            onehot = jax.nn.one_hot(relations, self.num_relations, dtype=x.dtype)
            # (N, R) einsum (R, Fi, Fo) with (N, Fi) -> (N, Fo); contraction
            # ordered so XLA emits R dense matmuls + weighted sum (MXU-bound).
            y = jnp.einsum("nf,rfu,nr->nu", x, w, onehot,
                           optimize="optimal")
            if b is not None:
                y = y + onehot @ b
        else:
            wr = jnp.take(w, relations, axis=0)  # (N, Fi, Fo)
            y = jnp.einsum("nf,nfu->nu", x, wr)
            if b is not None:
                y = y + jnp.take(b, relations, axis=0)
        return get_activation(self.activation)(y)


class RelationalMLP(nn.Module):
    """Stack of RelationalDense layers — the per-element atomic networks of
    HDNNP (``kgcnn/layers/mlp.py:329``)."""

    units: Union[int, Sequence[int]]
    num_relations: int
    activation: Any = "linear"
    use_bias: Any = True

    @nn.compact
    def __call__(self, x: Array, relations: Array) -> Array:
        units = self.units if isinstance(self.units, (list, tuple)) else [self.units]
        depth = len(units)
        acts = _as_list(self.activation, depth)
        biases = _as_list(self.use_bias, depth)
        for i, (u, a, b) in enumerate(zip(units, acts, biases)):
            x = RelationalDense(u, self.num_relations, activation=a,
                                use_bias=b, name=f"rel_dense_{i}")(x, relations)
        return x
