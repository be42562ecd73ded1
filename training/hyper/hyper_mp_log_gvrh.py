"""Hyperparameter configs for MatProject log shear moduli (parity: reference
``training/hyper/hyper_mp_log_gvrh.py`` — same dataset/model coverage, configs in this
framework's schema)."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

from gcnn_keras_tpu.training.hyper_templates import (
    molnet_model, qm_model, crystal_model, force_model, citation_model,
    data_section, training_section, compose)

_methods = [{"read_in_memory": {"radius": 5.0, "max_neighbours": 17}}]
_data = data_section("MatProjectLogGVRHDataset", methods=_methods)
_training = training_section(epochs=300, batch_size=64, learning_rate=5e-4, scaler="StandardLabelScaler")
_models = {
    "Megnet.make_crystal_model": crystal_model("Megnet"),
    "Schnet.make_crystal_model": crystal_model("Schnet"),
    "PAiNN.make_crystal_model": crystal_model("PAiNN"),
    "DimeNetPP.make_crystal_model": crystal_model("DimeNetPP"),
    "CGCNN.make_crystal_model": crystal_model("CGCNN"),
    "NMPN.make_crystal_model": crystal_model("NMPN"),
    "MEGAN": qm_model("MEGAN"),
}
hyper = compose(_models, _data, _training)
