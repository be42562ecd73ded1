"""Hyperparameter configs for QM9 HOMO orbital energies (parity: reference
``training/hyper/hyper_qm9_orbitals.py`` — same dataset/model coverage, configs in this
framework's schema)."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

from gcnn_keras_tpu.training.hyper_templates import (
    molnet_model, qm_model, crystal_model, force_model, citation_model,
    data_section, training_section, compose)

_methods = [{"read_in_memory": {"label_column_name": "homo"}},
            {"map_list": {"method": "set_range", "max_distance": 5.0, "max_neighbours": 25}},
            {"map_list": {"method": "set_angle"}}]
_data = data_section("QM9Dataset", methods=_methods)
_training = training_section(epochs=500, batch_size=64, learning_rate=5e-4, scaler="StandardLabelScaler")
_models = {
    "Schnet": qm_model("Schnet", output_units=1),
    "Megnet": qm_model("Megnet", output_units=1),
    "NMPN": qm_model("NMPN", output_units=1),
    "PAiNN": qm_model("PAiNN", output_units=1),
    "DimeNetPP": qm_model("DimeNetPP", output_units=1),
    "MXMNet": qm_model("MXMNet", output_units=1),
    "EGNN": qm_model("EGNN", output_units=1),
}
hyper = compose(_models, _data, _training)
