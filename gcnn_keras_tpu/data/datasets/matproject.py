"""Materials Project / MatBench crystal datasets (parity:
``kgcnn/data/crystal.py:17`` CrystalDataset + the MatProject* dataset family
under ``kgcnn/data/datasets/``): CIF or pymatgen-JSON structures ->
periodic graphs."""
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


class MatBenchDataset(CrystalDataset):
    """Shared loader for the matbench JSON-gz tasks (parity: the nine
    ``kgcnn/data/datasets/MatProject*Dataset.py`` files, which all follow
    the same pattern on ``ml.materialsproject.org`` archives)."""

    _task: str = ""  # e.g. "matbench_mp_e_form"
    _label_is_class: bool = False

    def __init__(self, reload: bool = False, **kwargs):
        name = type(self).__name__.replace("Dataset", "")
        url = f"https://ml.materialsproject.org/projects/{self._task}.json.gz"
        dl = DownloadDataset(name, download_url=url,
                             download_file_name=f"{self._task}.json.gz",
                             extract_gz=True, reload=reload)
        super().__init__(data_directory=dl.data_directory, dataset_name=name,
                         **kwargs)

    def read_in_memory(self, radius: float = 5.0, max_neighbours: int = 17,
                       max_structures: Optional[int] = None, **kwargs):
        import json
        path = os.path.join(self.data_directory, f"{self._task}.json")
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
            if self._label_is_class:
                g["graph_labels"] = np.array([1.0 if label else 0.0],
                                             dtype=np.float32)
            else:
                g["graph_labels"] = np.array([label], dtype=np.float32)
            self.append(g)
        return self


class MatProjectEFormDataset(MatBenchDataset):
    """matbench_mp_e_form: formation energy per atom (eV/atom)."""
    _task = "matbench_mp_e_form"


class MatProjectGapDataset(MatBenchDataset):
    """matbench_mp_gap: DFT band gap (eV)."""
    _task = "matbench_mp_gap"


class MatProjectIsMetalDataset(MatBenchDataset):
    """matbench_mp_is_metal: metal/insulator classification."""
    _task = "matbench_mp_is_metal"
    _label_is_class = True


class MatProjectDielectricDataset(MatBenchDataset):
    """matbench_dielectric: refractive index."""
    _task = "matbench_dielectric"


class MatProjectJdft2dDataset(MatBenchDataset):
    """matbench_jdft2d: 2D-material exfoliation energy (meV/atom)."""
    _task = "matbench_jdft2d"


class MatProjectLogGVRHDataset(MatBenchDataset):
    """matbench_log_gvrh: log10 VRH shear modulus."""
    _task = "matbench_log_gvrh"


class MatProjectLogKVRHDataset(MatBenchDataset):
    """matbench_log_kvrh: log10 VRH bulk modulus."""
    _task = "matbench_log_kvrh"


class MatProjectPerovskitesDataset(MatBenchDataset):
    """matbench_perovskites: perovskite formation energy (eV/cell)."""
    _task = "matbench_perovskites"


class MatProjectPhononsDataset(MatBenchDataset):
    """matbench_phonons: highest phonon peak frequency (1/cm)."""
    _task = "matbench_phonons"


def _specie_z(site: dict) -> int:
    from ...mol.io import SYMBOL_TO_Z
    label = site["species"][0]["element"]
    return SYMBOL_TO_Z[label]


class MatBenchDataset2020(MatBenchDataset):
    """Generic matbench-v0.1 task selected by name (parity:
    ``kgcnn/data/datasets/MatBenchDataset2020.py``), e.g.
    ``dataset_name='matbench_mp_e_form'``."""

    def __init__(self, dataset_name: str = "matbench_mp_e_form",
                 reload: bool = False, **kwargs):
        self._task = dataset_name
        self._label_is_class = dataset_name in ("matbench_mp_is_metal",)
        super().__init__(reload=reload, **kwargs)
