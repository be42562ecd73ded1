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


def GatherNodesSelection(selection_index, index_source=None):
    """Gather node features by selected index columns
    (``kgcnn/layers/gather.py`` GatherEmbeddingSelection).

    ``index_source``: "edges" (columns 0=receiver, 1=sender), "angles"
    (columns of the (A, 3) angle-triple list), or None = auto. Auto picks
    "angles" when the batch has angles AND the selection needs them (any
    column >= 2, or a full 3-column selection) — consistently for ALL
    selected columns, never mixed (a [0, 2] selection reads angle columns
    0 and 2, not receiver + angle)."""
    def call(batch, nodes):
        sel = list(selection_index) if isinstance(selection_index,
                                                  (list, tuple)) \
            else [selection_index]
        source = index_source
        if source is None:
            wants_angles = any(i >= 2 for i in sel) or len(sel) == 3
            source = "angles" if (batch.angles is not None and wants_angles) \
                else "edges"
        if source == "angles":
            if batch.angles is None:
                raise ValueError("GatherNodesSelection(index_source='angles')"
                                 " needs batch.angles")
            return [gather_nodes(nodes, batch.angles[:, i]) for i in sel]
        idx_arrays = {0: batch.receivers, 1: batch.senders}
        return [gather_nodes(nodes, idx_arrays[i]) for i in sel]
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
