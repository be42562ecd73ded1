"""Custom initializers (parity: ``kgcnn/ops/initializer.py``)."""
from __future__ import annotations

import jax
import jax.numpy as jnp


def glorot_orthogonal(scale: float = 2.0, dtype=jnp.float32):
    """Orthogonal init rescaled to glorot variance (DimeNet's initializer)."""

    def init(key, shape, dtype=dtype):
        assert len(shape) == 2, "glorot_orthogonal expects 2D weights"
        w = jax.nn.initializers.orthogonal()(key, shape, dtype)
        fan_in, fan_out = shape
        target_var = scale / (fan_in + fan_out)
        w = w * jnp.sqrt(target_var / jnp.maximum(jnp.var(w), 1e-12))
        return w

    return init
