"""History / split-index / extxyz persistence helpers (parity:
``kgcnn/utils/save_load_utils.py:11-101``)."""
from __future__ import annotations

import json
import pickle
from typing import Dict, List, Sequence

import numpy as np


def save_history(history: Dict[str, List[float]], filename: str):
    with open(filename, "w" if filename.endswith(".json") else "wb") as f:
        if filename.endswith(".json"):
            json.dump({k: [float(x) for x in v] for k, v in history.items()}, f)
        else:
            pickle.dump(history, f)


def load_history(filename: str) -> Dict[str, List[float]]:
    if filename.endswith(".json"):
        with open(filename) as f:
            return json.load(f)
    with open(filename, "rb") as f:
        return pickle.load(f)


def save_training_indices(indices: Sequence[np.ndarray], filename: str):
    with open(filename, "wb") as f:
        pickle.dump([np.asarray(i) for i in indices], f)


def load_training_indices(filename: str) -> List[np.ndarray]:
    with open(filename, "rb") as f:
        return pickle.load(f)


def save_extxyz(filename: str, frames: Sequence[dict]):
    """Write GraphDict-like frames to extended xyz (inverse of
    ``mol/io.py:read_extxyz_file``)."""
    from ..mol.io import PERIODIC_TABLE
    with open(filename, "w") as f:
        for g in frames:
            z = np.asarray(g["node_number"])
            xyz = np.asarray(g["node_coordinates"])
            n = len(z)
            props = "Properties=species:S:1:pos:R:3"
            comment = []
            has_force = "force" in g
            if has_force:
                props += ":forces:R:3"
            comment.append(props)
            if "energy" in g:
                comment.append(f"energy={float(np.asarray(g['energy']).reshape(-1)[0])}")
            if "total_charge" in g:
                comment.append(
                    f"charge={float(np.asarray(g['total_charge']).reshape(-1)[0])}")
            if "graph_lattice" in g:
                lat = " ".join(str(float(v)) for v in np.asarray(g["graph_lattice"]).reshape(-1))
                comment.append(f'Lattice="{lat}"')
            f.write(f"{n}\n{' '.join(comment)}\n")
            for i in range(n):
                row = f"{PERIODIC_TABLE[int(z[i])]} " + \
                    " ".join(f"{v:.8f}" for v in xyz[i])
                if has_force:
                    row += " " + " ".join(f"{v:.8f}" for v in np.asarray(g["force"])[i])
                f.write(row + "\n")
