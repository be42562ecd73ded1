"""Custom activations (parity with reference ``kgcnn/ops/activ.py``)."""
from __future__ import annotations

import jax
import jax.numpy as jnp

_LOG2 = 0.6931471805599453


def shifted_softplus(x):
    """softplus(x) - log(2); zero at x=0 (SchNet's ssp)."""
    return jax.nn.softplus(x) - _LOG2


def softplus2(x):
    """log(exp(x)+1) - log(2) — MEGNet's variant, numerically identical here."""
    return jax.nn.softplus(x) - _LOG2


def leaky_softplus(x, alpha: float = 0.05):
    return alpha * x + (1.0 - alpha) * jax.nn.softplus(x)


def leaky_relu(x, alpha: float = 0.05):
    return jax.nn.leaky_relu(x, negative_slope=alpha)


def swish(x):
    return jax.nn.silu(x)


def mish(x):
    return x * jnp.tanh(jax.nn.softplus(x))


_ACTIVATIONS = {
    "linear": lambda x: x,
    "relu": jax.nn.relu,
    "elu": jax.nn.elu,
    "selu": jax.nn.selu,
    "gelu": jax.nn.gelu,
    "sigmoid": jax.nn.sigmoid,
    "tanh": jnp.tanh,
    "softplus": jax.nn.softplus,
    "swish": swish,
    "silu": swish,
    "mish": mish,
    "shifted_softplus": shifted_softplus,
    "softplus2": softplus2,
    "leaky_softplus": leaky_softplus,
    "leaky_relu": leaky_relu,
    # reference-style registry names ("kgcnn>..."), kept for config parity
    "kgcnn>shifted_softplus": shifted_softplus,
    "kgcnn>softplus2": softplus2,
    "kgcnn>leaky_softplus": leaky_softplus,
    "kgcnn>leaky_relu": leaky_relu,
    "kgcnn>swish": swish,
}


def get_activation(name_or_fn):
    """Resolve an activation by name or pass a callable through."""
    if callable(name_or_fn):
        return name_or_fn
    if isinstance(name_or_fn, dict):  # serialized {"class_name": ..., "config": {...}}
        cfg = name_or_fn.get("config", {})
        name = name_or_fn.get("class_name", "linear")
        base = _ACTIVATIONS[name.replace("function:", "")]
        if cfg:
            import functools
            return functools.partial(base, **{k: v for k, v in cfg.items() if k != "name"})
        return base
    try:
        return _ACTIVATIONS[name_or_fn]
    except KeyError:
        raise ValueError(f"Unknown activation {name_or_fn!r}")
