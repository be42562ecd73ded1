"""Materials Project / MatBench crystal datasets (parity:
``kgcnn/data/crystal.py:17`` CrystalDataset + MatProject* datasets):
CIF or pymatgen-JSON structures -> periodic graphs."""
from __future__ import annotations

import os
from typing import Optional

import numpy as np

from ..dataset import MemoryGraphDataset
from ..download import DownloadDataset
from ...crystal.graph_builder import structure_to_graph, add_radius_bonds


class CrystalDataset(MemoryGraphDataset):
    """Base crystal dataset (``kgcnn/data/crystal.py:17``)."""

    def structures_to_graphs(self, structures, labels=None,
                             radius: float = 5.0,
                             max_neighbours: Optional[int] = 17):
        for i, s in enumerate(structures):
            g = structure_to_graph(s)
            g = add_radius_bonds(g, radius=radius, max_neighbours=max_neighbours)
            if labels is not None:
                g["graph_labels"] = np.atleast_1d(
                    np.asarray(labels[i], dtype=np.float32))
            self.append(g)
        return self


class MatProjectEFormDataset(CrystalDataset):
    """matbench_mp_e_form: formation energy per atom."""

    _url = ("https://ml.materialsproject.org/projects/matbench_mp_e_form.json.gz")

    def __init__(self, reload: bool = False, **kwargs):
        dl = DownloadDataset("MatProjectEForm", download_url=self._url,
                             download_file_name="matbench_mp_e_form.json.gz",
                             extract_gz=True, reload=reload)
        super().__init__(data_directory=dl.data_directory,
                         dataset_name="MatProjectEForm", **kwargs)

    def read_in_memory(self, radius: float = 5.0, max_neighbours: int = 17,
                       max_structures: Optional[int] = None, **kwargs):
        import json
        path = os.path.join(self.data_directory, "matbench_mp_e_form.json")
        if not os.path.exists(path):
            raise FileNotFoundError(f"{path} missing — offline?")
        with open(path) as f:
            data = json.load(f)
        rows = data["data"]
        if max_structures:
            rows = rows[:max_structures]
        for struct_dict, label in rows:
            lattice = np.array(struct_dict["lattice"]["matrix"])
            frac = np.array([s["abc"] for s in struct_dict["sites"]])
            z = np.array([_specie_z(s) for s in struct_dict["sites"]])
            g = structure_to_graph({"frac_coords": frac, "lattice": lattice,
                                    "atomic_numbers": z})
            g = add_radius_bonds(g, radius=radius, max_neighbours=max_neighbours)
            g["graph_labels"] = np.array([label], dtype=np.float32)
            self.append(g)
        return self


def _specie_z(site: dict) -> int:
    from ...mol.io import SYMBOL_TO_Z
    label = site["species"][0]["element"]
    return SYMBOL_TO_Z[label]
