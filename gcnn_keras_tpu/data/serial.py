"""Serialized dataset instantiation (parity: ``kgcnn/data/serial.py:17``
deserialize): ``{class_name, module_name, config, methods}`` -> dataset with
listed methods executed."""
from __future__ import annotations

import importlib
from typing import Any, Dict

_DATASET_MODULES = {
    # name -> module path under data.datasets
    "QM7Dataset": "gcnn_keras_tpu.data.datasets.qm",
    "QM7bDataset": "gcnn_keras_tpu.data.datasets.qm",
    "QM8Dataset": "gcnn_keras_tpu.data.datasets.qm",
    "QM9Dataset": "gcnn_keras_tpu.data.datasets.qm",
    "MD17Dataset": "gcnn_keras_tpu.data.datasets.md17",
    "MD17RevisedDataset": "gcnn_keras_tpu.data.datasets.md17",
    "ISO17Dataset": "gcnn_keras_tpu.data.datasets.md17",
    "CoraDataset": "gcnn_keras_tpu.data.datasets.citation",
    "CoraLuDataset": "gcnn_keras_tpu.data.datasets.citation",
    "ESOLDataset": "gcnn_keras_tpu.data.datasets.moleculenet",
    "FreeSolvDataset": "gcnn_keras_tpu.data.datasets.moleculenet",
    "LipopDataset": "gcnn_keras_tpu.data.datasets.moleculenet",
    "ClinToxDataset": "gcnn_keras_tpu.data.datasets.moleculenet",
    "Tox21MolNetDataset": "gcnn_keras_tpu.data.datasets.moleculenet",
    "SIDERDataset": "gcnn_keras_tpu.data.datasets.moleculenet",
    "MUTAGDataset": "gcnn_keras_tpu.data.datasets.tudataset",
    "MutagenicityDataset": "gcnn_keras_tpu.data.datasets.tudataset",
    "PROTEINSDataset": "gcnn_keras_tpu.data.datasets.tudataset",
    "GraphTUDataset2020": "gcnn_keras_tpu.data.datasets.tudataset",
    "MatProjectEFormDataset": "gcnn_keras_tpu.data.datasets.matproject",
    "MatProjectGapDataset": "gcnn_keras_tpu.data.datasets.matproject",
    "MatProjectIsMetalDataset": "gcnn_keras_tpu.data.datasets.matproject",
    "MatProjectDielectricDataset": "gcnn_keras_tpu.data.datasets.matproject",
    "MatProjectJdft2dDataset": "gcnn_keras_tpu.data.datasets.matproject",
    "MatProjectLogGVRHDataset": "gcnn_keras_tpu.data.datasets.matproject",
    "MatProjectLogKVRHDataset": "gcnn_keras_tpu.data.datasets.matproject",
    "MatProjectPerovskitesDataset": "gcnn_keras_tpu.data.datasets.matproject",
    "MatProjectPhononsDataset": "gcnn_keras_tpu.data.datasets.matproject",
    "MoleculeNetDataset2018": "gcnn_keras_tpu.data.datasets.moleculenet",
    "QM9MolNetDataset": "gcnn_keras_tpu.data.datasets.moleculenet",
    "MatBenchDataset2020": "gcnn_keras_tpu.data.datasets.matproject",
    "VgdMockDataset": "gcnn_keras_tpu.data.datasets.vgd",
    "VgdRbMotifsDataset": "gcnn_keras_tpu.data.datasets.vgd",
    "VisualGraphDataset": "gcnn_keras_tpu.data.visual_graph",
    "SyntheticQM9Dataset": "gcnn_keras_tpu.data.datasets.synthetic",
    "SyntheticMDDataset": "gcnn_keras_tpu.data.datasets.synthetic",
    "SyntheticCitationDataset": "gcnn_keras_tpu.data.datasets.synthetic",
}


def deserialize(config: Dict[str, Any]):
    name = config["class_name"]
    module = config.get("module_name") or _DATASET_MODULES.get(name)
    if module is None:
        raise ValueError(f"unknown dataset {name}")
    mod = importlib.import_module(module)
    cls = getattr(mod, name)
    ds = cls(**config.get("config", {}))
    for m in config.get("methods", []):
        for method_name, method_kwargs in m.items():
            getattr(ds, method_name)(**method_kwargs)
    return ds
