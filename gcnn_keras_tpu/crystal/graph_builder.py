"""Crystal graph builders (parity: ``kgcnn/crystal/graph_builder.py``:
add_knn_bonds:79, add_radius_bonds:112 on pymatgen structures).

Works on a plain dict {``frac_coords`` or ``cart_coords``, ``lattice`` (3,3),
``atomic_numbers``} so pymatgen is optional; a pymatgen Structure is
converted if passed.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np

from ..graph.preprocess import set_range_periodic


def _as_struct_dict(structure) -> Dict[str, np.ndarray]:
    if isinstance(structure, dict):
        d = dict(structure)
        if "cart_coords" not in d:
            d["cart_coords"] = np.asarray(d["frac_coords"]) @ np.asarray(d["lattice"])
        return d
    # pymatgen Structure duck-typing
    return {
        "cart_coords": np.array(structure.cart_coords),
        "frac_coords": np.array(structure.frac_coords),
        "lattice": np.array(structure.lattice.matrix),
        "atomic_numbers": np.array([s.specie.Z for s in structure.sites]),
    }


def structure_to_graph(structure) -> Dict[str, np.ndarray]:
    """Structure -> GraphDict properties (no bonds yet)."""
    s = _as_struct_dict(structure)
    return {
        "node_number": np.asarray(s["atomic_numbers"], dtype=np.int64),
        "node_coordinates": np.asarray(s["cart_coords"], dtype=np.float32),
        "graph_lattice": np.asarray(s["lattice"], dtype=np.float32),
    }


def add_radius_bonds(graph: Dict[str, np.ndarray], radius: float = 5.0,
                     max_neighbours: Optional[int] = None) -> Dict[str, np.ndarray]:
    """Periodic radius neighbor list -> range_indices/range_image
    (graph_builder.py:112)."""
    return set_range_periodic(graph, max_distance=radius,
                              max_neighbours=max_neighbours)


def add_knn_bonds(graph: Dict[str, np.ndarray], k: int = 12,
                  search_radius: float = 8.0) -> Dict[str, np.ndarray]:
    """k-nearest periodic neighbors (graph_builder.py:79)."""
    return set_range_periodic(graph, max_distance=search_radius,
                              max_neighbours=k)
