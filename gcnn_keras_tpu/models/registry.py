"""Dynamic model registry (parity: ``kgcnn/model/utils.py:17``
``get_model_class`` + serialized ``{class_name, module_name, config}``)."""
from __future__ import annotations

import importlib
from typing import Any, Callable, Dict

_REGISTRY: Dict[str, Callable] = {}

# module name -> import path, mirroring kgcnn.literature.<Name>
_MODULES = {
    "GCN": "gcnn_keras_tpu.models.gcn",
    "GIN": "gcnn_keras_tpu.models.gin",
    "GAT": "gcnn_keras_tpu.models.gat",
    "GATv2": "gcnn_keras_tpu.models.gatv2",
    "GraphSAGE": "gcnn_keras_tpu.models.sage",
    "Schnet": "gcnn_keras_tpu.models.schnet",
    "PAiNN": "gcnn_keras_tpu.models.painn",
    "HDNNP2nd": "gcnn_keras_tpu.models.hdnnp2nd",
    "HDNNP4th": "gcnn_keras_tpu.models.hdnnp4th",
    "DimeNetPP": "gcnn_keras_tpu.models.dimenet_pp",
    "Megnet": "gcnn_keras_tpu.models.megnet",
    "NMPN": "gcnn_keras_tpu.models.nmpn",
    "AttentiveFP": "gcnn_keras_tpu.models.attentivefp",
    "DMPNN": "gcnn_keras_tpu.models.dmpnn",
    "CGCNN": "gcnn_keras_tpu.models.cgcnn",
    "EGNN": "gcnn_keras_tpu.models.egnn",
    "RGCN": "gcnn_keras_tpu.models.rgcn",
    "GNNFilm": "gcnn_keras_tpu.models.gnnfilm",
    "INorp": "gcnn_keras_tpu.models.inorp",
    "MXMNet": "gcnn_keras_tpu.models.mxmnet",
    "HamNet": "gcnn_keras_tpu.models.hamnet",
    "MAT": "gcnn_keras_tpu.models.mat",
    "CMPNN": "gcnn_keras_tpu.models.cmpnn",
    "Unet": "gcnn_keras_tpu.models.unet",
    "MEGAN": "gcnn_keras_tpu.models.megan",
    "GNNExplain": "gcnn_keras_tpu.models.gnnexplain",
}


def register_model(name: str):
    def deco(fn):
        _REGISTRY[name] = fn
        return fn
    return deco


def get_model_class(module_name: str, class_name: str = "make_model") -> Callable:
    """Import ``make_model`` (or named builder) from a model module.

    Accepts both short names ("Schnet") and full paths
    ("kgcnn.literature.Schnet" is translated for config compatibility).
    """
    short = module_name.split(".")[-1]
    path = _MODULES.get(short, module_name)
    mod = importlib.import_module(path)
    return getattr(mod, class_name)


def make_model_by_name(module_name: str, class_name: str = "make_model",
                       config: Dict[str, Any] | None = None):
    return get_model_class(module_name, class_name)(**(config or {}))


def update_model_kwargs(defaults: Dict[str, Any], kwargs: Dict[str, Any]) -> Dict[str, Any]:
    """Nested-default merge (parity: ``kgcnn/model/utils.py:120``)."""
    out = dict(defaults)
    for k, v in (kwargs or {}).items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            merged = dict(out[k])
            merged.update(v)
            out[k] = merged
        else:
            out[k] = v
    return out
