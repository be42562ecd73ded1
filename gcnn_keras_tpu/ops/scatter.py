"""Named scatter dispatch (parity: ``kgcnn/ops/scatter.py:5-26``)."""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def tensor_scatter_nd_ops_by_name(name: str, target: Array, indices: Array,
                                  updates: Array) -> Array:
    idx = tuple(indices[..., i] for i in range(indices.shape[-1]))
    at = target.at[idx]
    if name in ("add", "scatter_add", "tensor_scatter_nd_add"):
        return at.add(updates)
    if name in ("max", "scatter_max", "tensor_scatter_nd_max"):
        return at.max(updates)
    if name in ("min", "scatter_min", "tensor_scatter_nd_min"):
        return at.min(updates)
    if name in ("update", "scatter_update"):
        return at.set(updates)
    raise ValueError(f"unknown scatter op {name!r}")
