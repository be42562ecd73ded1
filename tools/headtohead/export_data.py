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
    # charge labels for the charge-only protocol come from a SEPARATE
    # stream so esp/esp_grad stay byte-identical to the r2 export
    rq = np.random.RandomState(66)
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
        q = rq.randn(n).astype(np.float32) * 0.1
        payload[f"f{i}_charge"] = q - q.mean()  # consistent with q_tot = 0
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
    # 8 GCN splits (VERDICT r2 item 9: >=5 seeds for the GCN row); the
    # per-seed RandomState formula keeps splits 0-2 identical to r2
    for s in range(8):
        idx = np.random.RandomState(2000 + s).permutation(n)
        n_train = int(0.5 * n)
        train_mask = np.zeros(n, dtype=bool)
        train_mask[idx[:n_train]] = True
        val_mask = ~train_mask
        payload[f"split{s}_train_mask"] = train_mask
        payload[f"split{s}_val_mask"] = val_mask
    np.savez(os.path.join(DATA_DIR, "cora.npz"), **payload)
    print(f"cora.npz: {n} nodes, {payload['edge_indices'].shape[0]} edges")


def export_crystal():
    """Synthetic periodic structures for the crystal head-to-head row.

    Neighbor lists AND periodic images are precomputed here (reference
    convention: image shifts the sender) so both frameworks consume
    identical edges — the comparison is training, not preprocessing."""
    from gcnn_keras_tpu.graph.preprocess import set_range_periodic

    rs = np.random.RandomState(31)
    payload = {}
    n_cells = 48
    labels = []
    for i in range(n_cells):
        na = rs.randint(2, 7)
        a = 3.5 + rs.rand() * 2
        lattice = (np.diag([a, a, a]) + rs.randn(3, 3) * 0.1)
        frac = rs.rand(na, 3)
        z = rs.choice([3, 8, 13, 14, 26], size=na)
        xyz = frac @ lattice
        g = {"node_coordinates": xyz.astype(np.float32),
             "graph_lattice": lattice.astype(np.float32)}
        g = set_range_periodic(g, max_distance=4.0, backend="numpy")
        d = np.asarray(g["range_attributes"]).reshape(-1)
        label = float(np.exp(-d).sum() / na + 0.05 * z.mean())
        payload[f"c{i}_z"] = z.astype(np.int64)
        payload[f"c{i}_xyz"] = xyz.astype(np.float32)
        payload[f"c{i}_lattice"] = lattice.astype(np.float32)
        payload[f"c{i}_edge_indices"] = g["range_indices"].astype(np.int64)
        payload[f"c{i}_edge_image"] = g["range_image"].astype(np.int64)
        labels.append(label)
    labels = np.asarray(labels, dtype=np.float64)
    mean = float(labels.mean())
    for i, y in enumerate(labels):
        payload[f"c{i}_label"] = np.array([y - mean], dtype=np.float32)
    payload["n_cells"] = np.array(n_cells)
    payload["label_mean"] = np.array(mean)
    for s in range(5):  # 5 crystal splits; 0-2 unchanged (same RandomState)
        idx = np.random.RandomState(3000 + s).permutation(n_cells)
        payload[f"split{s}_val"] = idx[:10].astype(np.int64)
        payload[f"split{s}_train"] = idx[10:].astype(np.int64)
    np.savez(os.path.join(DATA_DIR, "crystal.npz"), **payload)
    print(f"crystal.npz: {n_cells} cells, "
          f"edges/cell ~{payload['c0_edge_indices'].shape[0]}")


if __name__ == "__main__":
    os.makedirs(DATA_DIR, exist_ok=True)
    export_md()
    export_cora()
    export_crystal()
