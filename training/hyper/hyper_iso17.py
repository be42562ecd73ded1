"""Hyperparameter configs for ISO17 energy+force (parity: reference
``training/hyper/hyper_iso17.py`` — same dataset/model coverage, configs in this
framework's schema)."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

from gcnn_keras_tpu.training.hyper_templates import (
    molnet_model, qm_model, crystal_model, force_model, citation_model,
    data_section, training_section, compose)

_methods = [{"map_list": {"method": "set_range", "max_distance": 5.0, "max_neighbours": 25}}]
_data = data_section("ISO17Dataset", config={}, methods=_methods)
_training = training_section(
    epochs=1000, batch_size=32, learning_rate=1e-3,
    loss_weights={"energy": 1.0, "force": 49.0},
    scaler="EnergyForceExtensiveLabelScaler")
_models = {
    "Schnet.EnergyForceModel": force_model("Schnet"),
    "PAiNN.EnergyForceModel": force_model("PAiNN"),
    "DimeNetPP.EnergyForceModel": force_model("DimeNetPP"),
    "NMPN.EnergyForceModel": force_model("NMPN"),
    "Megnet.EnergyForceModel": force_model("Megnet"),
    "MXMNet.EnergyForceModel": force_model("MXMNet"),
    "EGNN.EnergyForceModel": force_model("EGNN"),
}
hyper = compose(_models, _data, _training)
