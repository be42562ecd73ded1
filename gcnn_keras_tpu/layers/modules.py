"""Reference-named basic modules (parity surface for
``kgcnn/layers/modules.py``): the 'Lazy' ragged arithmetic of the reference
is plain array arithmetic on flat batches."""
from __future__ import annotations

import jax.numpy as jnp

from .mlp import Dense as DenseEmbedding, Dense  # noqa: F401
from ..ops.activ import get_activation


def Activation(activation):
    fn = get_activation(activation)
    return lambda x: fn(x)


def LazyAdd():
    return lambda inputs: sum(inputs[1:], inputs[0])


def LazySubtract():
    return lambda inputs: inputs[0] - inputs[1]


def LazyMultiply():
    def call(inputs):
        out = inputs[0]
        for x in inputs[1:]:
            out = out * x
        return out
    return call


def LazyAverage():
    return lambda inputs: sum(inputs[1:], inputs[0]) / len(inputs)


def LazyConcatenate(axis=-1):
    return lambda inputs: jnp.concatenate(inputs, axis=axis)


def ExpandDims(axis=-1):
    return lambda x: jnp.expand_dims(x, axis)


def ZerosLike():
    return lambda x: jnp.zeros_like(x)


from ..models.common import OptionalInputEmbedding  # noqa: E402,F401
