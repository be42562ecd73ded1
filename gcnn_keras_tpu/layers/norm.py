"""Mask-aware normalization over flat graph batches.

Replaces ``kgcnn/layers/norm.py`` (GraphLayerNormalization /
GraphBatchNormalization on ragged values): statistics must ignore padding
rows, which the reference got for free from ragged flat-values and we get
from explicit masks.
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

Array = jax.Array


class GraphLayerNorm(nn.Module):
    """LayerNorm over the feature axis of flat node/edge values — padding
    rows are irrelevant since stats are per-row."""

    epsilon: float = 1e-3  # keras LayerNormalization default (norm.py:20)
    use_scale: bool = True
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: Array) -> Array:
        return nn.LayerNorm(epsilon=self.epsilon, use_scale=self.use_scale,
                            use_bias=self.use_bias)(x)


class GraphBatchNorm(nn.Module):
    """BatchNorm across all *valid* rows of the flat batch.

    The running statistics must exclude padding rows, so mean/var are
    computed with the mask (reference gets this from ragged flat values,
    ``kgcnn/layers/norm.py:114``).
    """

    momentum: float = 0.99
    epsilon: float = 1e-3
    use_running_average: Optional[bool] = None

    @nn.compact
    def __call__(self, x: Array, mask: Array,
                 use_running_average: Optional[bool] = None) -> Array:
        use_ra = nn.merge_param("use_running_average",
                                self.use_running_average, use_running_average)
        feat = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((feat,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((feat,), jnp.float32))
        scale = self.param("scale", nn.initializers.ones, (feat,))
        bias = self.param("bias", nn.initializers.zeros, (feat,))

        if use_ra:
            mean, var = ra_mean.value, ra_var.value
        else:
            m = mask.astype(x.dtype).reshape(mask.shape + (1,) * (x.ndim - mask.ndim))
            cnt = jnp.maximum(jnp.sum(m), 1.0)
            mean = jnp.sum(x * m, axis=tuple(range(x.ndim - 1))) / cnt
            var = jnp.sum(m * (x - mean) ** 2, axis=tuple(range(x.ndim - 1))) / cnt
            if not self.is_initializing():
                ra_mean.value = self.momentum * ra_mean.value + (1 - self.momentum) * mean
                ra_var.value = self.momentum * ra_var.value + (1 - self.momentum) * var
        y = (x - mean) * jax.lax.rsqrt(var + self.epsilon)
        return y * scale + bias
