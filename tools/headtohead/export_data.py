"""Export IDENTICAL synthetic training data for the head-to-head
reference-vs-this-framework accuracy comparison (VERDICT round-1 item 2).

Everything that could drift between implementations is precomputed ONCE here
and consumed verbatim by both sides:

- geometry + labels from ``SyntheticMDDataset`` (fixed seed),
- neighbor lists (``set_range`` cutoff 4 A / 15 neighbours) and angle triples,
- synthetic esp / esp_grad node fields (HDNNP4th) and total_charge,
- energies centered by the full-dataset mean (scale recorded),
- per-seed train/val splits,
- the Cora-like single graph for GCN with per-seed semi-supervised masks.

Output: tools/headtohead/data/md.npz, cora.npz.

Usage: python tools/headtohead/export_data.py
"""
from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

DATA_DIR = os.path.join(os.path.dirname(__file__), "data")
SEEDS = (0, 1, 2)


def export_md():
    from gcnn_keras_tpu.data.datasets.synthetic import SyntheticMDDataset
    from gcnn_keras_tpu.graph.preprocess import set_range, set_angle

    ds = SyntheticMDDataset(num_frames=128, num_atoms=9, seed=7)
    rs = np.random.RandomState(55)
    payload = {}
    energies = []
    for i, g in enumerate(ds):
        g = set_range(dict(g), max_distance=4.0, max_neighbours=15)
        g["edge_indices"] = g["range_indices"]
        g = set_angle(g, range_indices="edge_indices")
        n = len(g["node_number"])
        payload[f"f{i}_z"] = g["node_number"].astype(np.int64)
        payload[f"f{i}_xyz"] = g["node_coordinates"].astype(np.float32)
        payload[f"f{i}_edge_indices"] = g["edge_indices"].astype(np.int64)
        payload[f"f{i}_angle_indices_nodes"] = \
            g["angle_indices_nodes"].astype(np.int64)
        payload[f"f{i}_force"] = g["force"].astype(np.float32)
        payload[f"f{i}_esp"] = (rs.randn(n) * 0.02).astype(np.float32)
        payload[f"f{i}_esp_grad"] = (rs.randn(n, 3) * 0.02).astype(np.float32)
        payload[f"f{i}_total_charge"] = np.zeros((1,), dtype=np.float32)
        energies.append(float(g["energy"][0]))
    energies = np.asarray(energies, dtype=np.float64)
    e_mean = float(energies.mean())
    for i, e in enumerate(energies):
        payload[f"f{i}_energy"] = np.array([e - e_mean], dtype=np.float32)
    payload["n_frames"] = np.array(len(ds))
    payload["energy_mean"] = np.array(e_mean)
    # per-seed splits: 103 train / 25 val
    for s in SEEDS:
        idx = np.random.RandomState(1000 + s).permutation(len(ds))
        payload[f"split{s}_val"] = idx[:25].astype(np.int64)
        payload[f"split{s}_train"] = idx[25:].astype(np.int64)
    np.savez(os.path.join(DATA_DIR, "md.npz"), **payload)
    print(f"md.npz: {len(ds)} frames, E centered by {e_mean:.3f}, "
          f"edges/frame ~{payload['f0_edge_indices'].shape[0]}, "
          f"angles/frame ~{payload['f0_angle_indices_nodes'].shape[0]}")


def export_cora():
    from gcnn_keras_tpu.data.datasets.synthetic import SyntheticCitationDataset

    ds = SyntheticCitationDataset(num_nodes=500, num_classes=7,
                                  feature_dim=64, avg_degree=4, seed=1)
    g = ds[0]
    n = len(g["node_labels"])
    payload = {
        "node_attributes": g["node_attributes"].astype(np.float32),
        "node_labels": g["node_labels"].astype(np.int64),
        "edge_indices": g["edge_indices"].astype(np.int64),
        "edge_weights": g["edge_weights"].astype(np.float32),
        "num_classes": np.array(7),
    }
    for s in SEEDS:
        idx = np.random.RandomState(2000 + s).permutation(n)
        n_train = int(0.5 * n)
        train_mask = np.zeros(n, dtype=bool)
        train_mask[idx[:n_train]] = True
        val_mask = ~train_mask
        payload[f"split{s}_train_mask"] = train_mask
        payload[f"split{s}_val_mask"] = val_mask
    np.savez(os.path.join(DATA_DIR, "cora.npz"), **payload)
    print(f"cora.npz: {n} nodes, {payload['edge_indices'].shape[0]} edges")


if __name__ == "__main__":
    os.makedirs(DATA_DIR, exist_ok=True)
    export_md()
    export_cora()
