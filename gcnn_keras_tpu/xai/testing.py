"""Mock models/datasets for XAI testing (parity: ``kgcnn/xai/testing.py``
MockMegan / VgdMockDataset)."""
from __future__ import annotations

import numpy as np

from ..data.dataset import MemoryGraphDataset


class MockImportanceModel:
    """Deterministic stand-in: importances proportional to node degree and
    edge weight — lets explanation pipelines be tested without training."""

    def __init__(self, importance_channels: int = 2):
        self.k = importance_channels

    def init(self, rng, batch, **kwargs):
        return {}

    def apply(self, variables, batch, **kwargs):
        import jax.numpy as jnp
        deg = jnp.zeros(batch.n_node).at[batch.receivers].add(
            batch.edge_mask.astype(jnp.float32))
        node_imp = jnp.stack([deg / jnp.maximum(deg.max(), 1.0)] * self.k, axis=1)
        edge_imp = jnp.stack([batch.edge_mask.astype(jnp.float32)] * self.k, axis=1)
        out = jnp.zeros((batch.n_graphs, 1))
        return {"output": out, "node_importances": node_imp,
                "edge_importances": edge_imp}


class VgdMockDataset(MemoryGraphDataset):
    """Random graphs with ground-truth importance masks (VgdMockDataset)."""

    def __init__(self, num_graphs: int = 16, seed: int = 0, **kwargs):
        super().__init__(dataset_name="VgdMock", **kwargs)
        rs = np.random.RandomState(seed)
        for _ in range(num_graphs):
            n = rs.randint(5, 12)
            ei = []
            for i in range(n):
                for _ in range(2):
                    j = rs.randint(n)
                    if j != i:
                        ei.append([i, j]); ei.append([j, i])
            ei = np.unique(np.array(ei, dtype=np.int64), axis=0)
            motif = rs.rand(n) > 0.7  # "important" nodes
            self.append({
                "node_attributes": rs.randn(n, 8).astype(np.float32),
                "node_number": rs.randint(1, 9, size=n),
                "edge_indices": ei,
                "node_importances_true": motif.astype(np.float32),
                "graph_labels": np.array([float(motif.sum())], dtype=np.float32),
            })
