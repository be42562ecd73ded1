"""MoleculeNet CSV datasets (parity: ``kgcnn/data/moleculenet.py:130``
MoleculeNetDataset + concrete ESOL/FreeSolv/Lipop/ClinTox/Tox21/SIDER):
SMILES -> RDKit conformers -> attribute graphs."""
from __future__ import annotations

import os
from typing import List, Optional

import numpy as np

from ..dataset import MemoryGraphDataset
from ..download import DownloadDataset
from ...graph.preprocess import set_range
from ...mol.encoder import OneHotEncoder

_DEFAULT_NODE_PROPS = ["Symbol", "TotalDegree", "FormalCharge", "NumRadicalElectrons",
                       "Hybridization", "IsAromatic", "TotalNumHs"]
_DEFAULT_EDGE_PROPS = ["BondType", "IsAromatic", "IsConjugated", "IsInRing"]


class MoleculeNetDataset(MemoryGraphDataset):
    def __init__(self, data_directory: Optional[str] = None,
                 dataset_name: Optional[str] = None,
                 file_name: Optional[str] = None, **kwargs):
        super().__init__(data_directory=data_directory, dataset_name=dataset_name,
                         file_name=file_name, **kwargs)

    def prepare_data(self, smiles_column_name: str = "smiles",
                     label_column_name=None, add_hydrogen: bool = True,
                     make_conformers: bool = True, **kwargs):
        """SMILES column -> molecules with graphs (requires rdkit)."""
        import pandas as pd
        from ...mol.graph_rdkit import MolecularGraphRDKit
        df = pd.read_csv(self.file_path)
        self._df = df
        labels = df[label_column_name] if label_column_name else None
        node_enc = {"Symbol": OneHotEncoder(
            ["C", "N", "O", "S", "F", "Cl", "Br", "I", "P", "H"]),
            "Hybridization": OneHotEncoder(["SP", "SP2", "SP3"])}
        edge_enc = {"BondType": OneHotEncoder(
            ["SINGLE", "DOUBLE", "TRIPLE", "AROMATIC"])}
        for i, smi in enumerate(df[smiles_column_name]):
            mg = MolecularGraphRDKit().from_smiles(
                smi, add_hydrogen=add_hydrogen, make_conformers=make_conformers)
            if mg.mol is None:
                continue
            g = {
                "node_number": mg.node_number,
                "node_symbol": mg.node_number,
                "edge_indices": mg.edge_indices,
                "node_attributes": mg.node_attributes(_DEFAULT_NODE_PROPS, node_enc),
                "edge_attributes": mg.edge_attributes(_DEFAULT_EDGE_PROPS, edge_enc),
            }
            coords = mg.node_coordinates
            if coords is not None:
                g["node_coordinates"] = coords
            if labels is not None:
                g["graph_labels"] = np.atleast_1d(
                    np.asarray(labels.iloc[i], dtype=np.float32))
            self.append(g)
        return self

    read_in_memory = prepare_data


class ESOLDataset(MoleculeNetDataset):
    _url = "https://deepchemdata.s3-us-west-1.amazonaws.com/datasets/delaney-processed.csv"

    def __init__(self, reload: bool = False, **kwargs):
        dl = DownloadDataset("ESOL", download_url=self._url,
                             download_file_name="delaney-processed.csv",
                             reload=reload)
        super().__init__(data_directory=dl.data_directory, dataset_name="ESOL",
                         file_name="delaney-processed.csv", **kwargs)

    def read_in_memory(self, **kwargs):
        return self.prepare_data(
            smiles_column_name="smiles",
            label_column_name="measured log solubility in mols per litre")


class FreeSolvDataset(MoleculeNetDataset):
    _url = "https://deepchemdata.s3-us-west-1.amazonaws.com/datasets/SAMPL.csv"

    def __init__(self, reload: bool = False, **kwargs):
        dl = DownloadDataset("FreeSolv", download_url=self._url,
                             download_file_name="SAMPL.csv", reload=reload)
        super().__init__(data_directory=dl.data_directory, dataset_name="FreeSolv",
                         file_name="SAMPL.csv", **kwargs)

    def read_in_memory(self, **kwargs):
        return self.prepare_data(smiles_column_name="smiles",
                                 label_column_name="expt")


class LipopDataset(MoleculeNetDataset):
    _url = "https://deepchemdata.s3-us-west-1.amazonaws.com/datasets/Lipophilicity.csv"

    def __init__(self, reload: bool = False, **kwargs):
        dl = DownloadDataset("Lipop", download_url=self._url,
                             download_file_name="Lipophilicity.csv", reload=reload)
        super().__init__(data_directory=dl.data_directory, dataset_name="Lipop",
                         file_name="Lipophilicity.csv", **kwargs)

    def read_in_memory(self, **kwargs):
        return self.prepare_data(smiles_column_name="smiles",
                                 label_column_name="exp")


class ClinToxDataset(MoleculeNetDataset):
    _url = "https://deepchemdata.s3-us-west-1.amazonaws.com/datasets/clintox.csv.gz"

    def __init__(self, reload: bool = False, **kwargs):
        dl = DownloadDataset("ClinTox", download_url=self._url,
                             download_file_name="clintox.csv.gz",
                             extract_gz=True, reload=reload)
        super().__init__(data_directory=dl.data_directory, dataset_name="ClinTox",
                         file_name="clintox.csv", **kwargs)

    def read_in_memory(self, **kwargs):
        return self.prepare_data(smiles_column_name="smiles",
                                 label_column_name="CT_TOX")


class Tox21MolNetDataset(MoleculeNetDataset):
    _url = "https://deepchemdata.s3-us-west-1.amazonaws.com/datasets/tox21.csv.gz"

    def __init__(self, reload: bool = False, **kwargs):
        dl = DownloadDataset("Tox21", download_url=self._url,
                             download_file_name="tox21.csv.gz",
                             extract_gz=True, reload=reload)
        super().__init__(data_directory=dl.data_directory, dataset_name="Tox21",
                         file_name="tox21.csv", **kwargs)


class SIDERDataset(MoleculeNetDataset):
    _url = "https://deepchemdata.s3-us-west-1.amazonaws.com/datasets/sider.csv.gz"

    def __init__(self, reload: bool = False, **kwargs):
        dl = DownloadDataset("SIDER", download_url=self._url,
                             download_file_name="sider.csv.gz",
                             extract_gz=True, reload=reload)
        super().__init__(data_directory=dl.data_directory, dataset_name="SIDER",
                         file_name="sider.csv", **kwargs)


class MoleculeNetDataset2018(MoleculeNetDataset):
    """Generic named MoleculeNet-2018 collection (parity:
    ``kgcnn/data/datasets/MoleculeNetDataset2018.py``): ``dataset_name``
    selects the deepchem CSV and the SMILES/label columns."""

    _TABLE = {
        "ESOL": ("delaney-processed.csv", "smiles",
                 "measured log solubility in mols per litre", False),
        "FreeSolv": ("SAMPL.csv", "smiles", "expt", False),
        "Lipop": ("Lipophilicity.csv", "smiles", "exp", False),
        "ClinTox": ("clintox.csv.gz", "smiles", "CT_TOX", True),
        "Tox21": ("tox21.csv.gz", "smiles", None, True),
        "SIDER": ("sider.csv.gz", "smiles", None, True),
        "BACE": ("bace.csv", "mol", "Class", False),
        "BBBP": ("BBBP.csv", "smiles", "p_np", False),
        "HIV": ("HIV.csv", "smiles", "HIV_active", False),
    }

    def __init__(self, dataset_name: str = "ESOL", reload: bool = False,
                 **kwargs):
        if dataset_name not in self._TABLE:
            raise ValueError(f"unknown MoleculeNet2018 set {dataset_name!r}; "
                             f"known: {sorted(self._TABLE)}")
        fn, smi, label, is_gz = self._TABLE[dataset_name]
        url = f"https://deepchemdata.s3-us-west-1.amazonaws.com/datasets/{fn}"
        dl = DownloadDataset(dataset_name, download_url=url,
                             download_file_name=fn, extract_gz=is_gz,
                             reload=reload)
        super().__init__(data_directory=dl.data_directory,
                         dataset_name=dataset_name,
                         file_name=fn[:-3] if is_gz else fn, **kwargs)
        self._smiles_col = smi
        self._label_col = label

    def read_in_memory(self, **kwargs):
        return self.prepare_data(smiles_column_name=self._smiles_col,
                                 label_column_name=self._label_col)


class QM9MolNetDataset(MoleculeNetDataset):
    """QM9 via the MoleculeNet CSV distribution (parity:
    ``kgcnn/data/datasets/QM9MolNetDataset.py``): 12 regression targets."""

    _url = "https://deepchemdata.s3-us-west-1.amazonaws.com/datasets/qm9.csv"
    _targets = ["mu", "alpha", "homo", "lumo", "gap", "r2", "zpve",
                "u0", "u298", "h298", "g298", "cv"]

    def __init__(self, reload: bool = False, **kwargs):
        dl = DownloadDataset("QM9MolNet", download_url=self._url,
                             download_file_name="qm9.csv", reload=reload)
        super().__init__(data_directory=dl.data_directory,
                         dataset_name="QM9MolNet", file_name="qm9.csv",
                         **kwargs)

    def read_in_memory(self, **kwargs):
        return self.prepare_data(smiles_column_name="smiles",
                                 label_column_name=self._targets)
