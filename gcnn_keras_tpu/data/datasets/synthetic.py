"""Synthetic datasets for offline development and CI.

These generate physically-plausible random molecular / citation data with
the same property names as the real datasets, so every pipeline (training
drivers, scalers, batching) runs end-to-end without network access.
"""
from __future__ import annotations

import numpy as np

from ..dataset import MemoryGraphDataset
from ...graph.preprocess import set_range, set_angle, normalize_edge_weights_symmetric, set_edge_weights_uniform


class SyntheticQM9Dataset(MemoryGraphDataset):
    """QM9-like molecules: 4-20 heavy+H atoms of H/C/N/O/F, positions from
    a perturbed lattice, extensive synthetic energy label with per-element
    offsets + pair interactions (so an extensive scaler + GNN can fit it)."""

    def __init__(self, num_molecules: int = 128, seed: int = 42,
                 max_atoms: int = 16, **kwargs):
        super().__init__(dataset_name="SyntheticQM9", **kwargs)
        rs = np.random.RandomState(seed)
        offsets = {1: -0.5, 6: -38.0, 7: -54.5, 8: -75.0, 9: -99.7}
        for _ in range(num_molecules):
            n = rs.randint(4, max_atoms + 1)
            z = rs.choice([1, 6, 7, 8, 9], size=n, p=[0.45, 0.35, 0.08, 0.1, 0.02])
            pos = _packed_positions(rs, n)
            d = np.linalg.norm(pos[:, None] - pos[None, :], axis=-1)
            np.fill_diagonal(d, np.inf)
            pair_e = np.sum(0.5 * np.exp(-d) * np.sqrt(z[:, None] * z[None, :]))
            energy = sum(offsets[int(a)] for a in z) + float(pair_e)
            self.append({
                "node_number": z.astype(np.int64),
                "node_coordinates": pos.astype(np.float32),
                "graph_labels": np.array([energy], dtype=np.float32),
                "energy": np.array([energy], dtype=np.float32),
            })

    def prepare_data(self, **kwargs):
        return self

    def read_in_memory(self, **kwargs):
        return self

    def set_ranges(self, max_distance: float = 4.0, max_neighbours: int = 15):
        return self.map_list("set_range", max_distance=max_distance,
                             max_neighbours=max_neighbours)


class SyntheticMDDataset(MemoryGraphDataset):
    """MD17-like single-molecule trajectory: one topology, perturbed
    geometries, synthetic smooth energy/force labels from a pair potential
    (forces are the exact analytic gradient, so an energy-force model can
    reach ~0 loss — a correctness probe for the force path)."""

    def __init__(self, num_frames: int = 128, num_atoms: int = 9,
                 seed: int = 7, **kwargs):
        super().__init__(dataset_name="SyntheticMD", **kwargs)
        rs = np.random.RandomState(seed)
        z = rs.choice([1, 6, 8], size=num_atoms)
        base = _packed_positions(rs, num_atoms)
        for _ in range(num_frames):
            pos = base + rs.randn(num_atoms, 3) * 0.1
            e, f = _pair_potential(pos, z)
            self.append({
                "node_number": z.astype(np.int64),
                "node_coordinates": pos.astype(np.float32),
                "energy": np.array([e], dtype=np.float32),
                "force": f.astype(np.float32),
            })


class SyntheticCitationDataset(MemoryGraphDataset):
    """Cora-like single graph: N nodes with class-correlated sparse features
    and homophilous edges — node classification benchmark substitute."""

    def __init__(self, num_nodes: int = 500, num_classes: int = 7,
                 feature_dim: int = 64, avg_degree: int = 4, seed: int = 1,
                 **kwargs):
        super().__init__(dataset_name="SyntheticCora", **kwargs)
        rs = np.random.RandomState(seed)
        labels = rs.randint(0, num_classes, size=num_nodes)
        centers = rs.randn(num_classes, feature_dim) * 2.0
        feats = centers[labels] + rs.randn(num_nodes, feature_dim)
        edges = []
        for i in range(num_nodes):
            same = np.nonzero(labels == labels[i])[0]
            other = np.nonzero(labels != labels[i])[0]
            for _ in range(avg_degree):
                j = rs.choice(same) if rs.rand() < 0.8 else rs.choice(other)
                if j != i:
                    edges.append([i, j])
                    edges.append([j, i])
        ei = np.unique(np.array(edges, dtype=np.int64), axis=0)
        g = {
            "node_attributes": feats.astype(np.float32),
            "node_labels": labels.astype(np.int64),
            "edge_indices": ei,
        }
        g = set_edge_weights_uniform(g)
        g = normalize_edge_weights_symmetric(g)
        self.append(g)


def _packed_positions(rs, n: int) -> np.ndarray:
    """Positions with a minimum separation (rejection-free: jittered grid)."""
    side = int(np.ceil(n ** (1 / 3)))
    grid = np.stack(np.meshgrid(*[np.arange(side)] * 3, indexing="ij"),
                    axis=-1).reshape(-1, 3)[:n]
    return grid * 1.6 + rs.rand(n, 3) * 0.5


def _pair_potential(pos: np.ndarray, z: np.ndarray):
    """Smooth pair energy + analytic forces (Morse-like)."""
    n = len(pos)
    diff = pos[:, None] - pos[None, :]
    d = np.linalg.norm(diff, axis=-1)
    np.fill_diagonal(d, 1.0)
    w = np.sqrt(np.outer(z, z))
    r0 = 1.5
    a = 1.2
    ex = np.exp(-a * (d - r0))
    e_mat = w * (ex**2 - 2 * ex)
    np.fill_diagonal(e_mat, 0.0)
    energy = 0.5 * float(e_mat.sum())
    # dE/dr_ij
    de = w * (-2 * a * ex**2 + 2 * a * ex)
    np.fill_diagonal(de, 0.0)
    unit = diff / d[..., None]
    forces = -(de[..., None] * unit).sum(axis=1)
    return energy, forces
