"""Reference-named gather API (parity surface for ``kgcnn/layers/gather.py``)."""
from __future__ import annotations

import jax.numpy as jnp

from .aggr import gather_nodes, gather_state


def GatherNodes(split_indices=(0, 1), concat_axis=-1):
    """Gather both edge endpoints and concatenate (gather.py:9)."""
    def call(batch, nodes):
        parts = []
        for idx in split_indices:
            src = batch.receivers if idx == 0 else batch.senders
            parts.append(gather_nodes(nodes, src))
        return jnp.concatenate(parts, axis=concat_axis) if concat_axis is not None \
            else parts
    return call


def GatherNodesSelection(selection_index):
    def call(batch, nodes):
        idx_arrays = {0: batch.receivers, 1: batch.senders}
        sel = selection_index if isinstance(selection_index, (list, tuple)) \
            else [selection_index]
        out = []
        for i in sel:
            if batch.angles is not None and i >= 2 or (
                    batch.angles is not None and len(sel) == 3):
                out.append(gather_nodes(nodes, batch.angles[:, i]))
            else:
                out.append(gather_nodes(nodes, idx_arrays[i]))
        return out
    return call


def GatherNodesIngoing():
    """Receiver-side features (gather.py:249)."""
    def call(batch, nodes):
        return gather_nodes(nodes, batch.receivers)
    return call


def GatherNodesOutgoing():
    """Sender-side features (gather.py:286)."""
    def call(batch, nodes):
        return gather_nodes(nodes, batch.senders)
    return call


def GatherState():
    """Broadcast per-graph state to nodes (gather.py:323)."""
    def call(batch, state):
        return gather_state(state, batch)
    return call
