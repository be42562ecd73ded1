"""MD17 / revised MD17 trajectory datasets (parity:
``kgcnn/data/datasets/MD17Dataset.py`` / ``MD17RevisedDataset.py``):
energy+force frames of single small molecules."""
from __future__ import annotations

import os
from typing import Optional

import numpy as np

from ..dataset import MemoryGraphDataset
from ..download import DownloadDataset


class MD17Dataset(MemoryGraphDataset):
    _url_base = "http://www.quantum-machine.org/gdml/data/npz/"

    def __init__(self, trajectory_name: str = "aspirin_dft", reload: bool = False,
                 **kwargs):
        self.trajectory_name = trajectory_name
        dl = DownloadDataset(f"MD17.{trajectory_name}",
                             download_url=self._url_base + f"md17_{trajectory_name}.npz"
                             if "ccsd" not in trajectory_name else
                             self._url_base + f"{trajectory_name}.zip",
                             download_file_name=f"md17_{trajectory_name}.npz",
                             reload=reload)
        super().__init__(data_directory=dl.data_directory,
                         dataset_name=f"MD17.{trajectory_name}", **kwargs)

    def read_in_memory(self, max_frames: Optional[int] = None, **kwargs):
        path = os.path.join(self.data_directory,
                            f"md17_{self.trajectory_name}.npz")
        if not os.path.exists(path):
            raise FileNotFoundError(
                f"{path} missing — offline? Use SyntheticMDDataset.")
        data = np.load(path)
        z = data["z"].astype(np.int64)
        R, E, F = data["R"], data["E"].reshape(-1), data["F"]
        n = len(E) if max_frames is None else min(max_frames, len(E))
        for i in range(n):
            self.append({
                "node_number": z,
                "node_coordinates": R[i].astype(np.float32),
                "energy": np.array([E[i]], dtype=np.float32),
                "force": F[i].astype(np.float32),
            })
        return self


class MD17RevisedDataset(MD17Dataset):
    _url_base = "https://archive.materialscloud.org/record/file?filename="

    def __init__(self, trajectory_name: str = "aspirin", reload: bool = False,
                 **kwargs):
        self.trajectory_name = trajectory_name
        dl = DownloadDataset(f"MD17Revised.{trajectory_name}",
                             download_url=self._url_base + f"rmd17_{trajectory_name}.npz"
                             + "&record_id=466",
                             download_file_name=f"rmd17_{trajectory_name}.npz",
                             reload=reload)
        MemoryGraphDataset.__init__(self, data_directory=dl.data_directory,
                                    dataset_name=f"MD17Revised.{trajectory_name}",
                                    **kwargs)

    def read_in_memory(self, max_frames=None, **kwargs):
        path = os.path.join(self.data_directory,
                            f"rmd17_{self.trajectory_name}.npz")
        if not os.path.exists(path):
            raise FileNotFoundError(
                f"{path} missing — offline? Use SyntheticMDDataset.")
        data = np.load(path)
        z = data["nuclear_charges"].astype(np.int64)
        R = data["coords"]
        E = data["energies"].reshape(-1)
        F = data["forces"]
        n = len(E) if max_frames is None else min(max_frames, len(E))
        for i in range(n):
            self.append({
                "node_number": z,
                "node_coordinates": R[i].astype(np.float32),
                "energy": np.array([E[i]], dtype=np.float32),
                "force": F[i].astype(np.float32),
            })
        return self


class ISO17Dataset(MemoryGraphDataset):
    """ISO17 C7O2H10 isomer trajectories (kgcnn/data/datasets/ISO17Dataset)."""

    _url = "http://quantum-machine.org/datasets/iso17.tar.gz"

    def __init__(self, reload: bool = False, **kwargs):
        dl = DownloadDataset("ISO17", download_url=self._url,
                             download_file_name="iso17.tar.gz", unpack_tar=True,
                             reload=reload)
        super().__init__(data_directory=dl.data_directory, dataset_name="ISO17",
                         **kwargs)
