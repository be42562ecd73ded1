"""Hyperparameter configs for ESOL (aqueous solubility) (parity: reference
``training/hyper/hyper_esol.py`` — same dataset/model coverage, configs in this
framework's schema)."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

from gcnn_keras_tpu.training.hyper_templates import (
    molnet_model, qm_model, crystal_model, force_model, citation_model,
    data_section, training_section, compose)

_methods = [{"map_list": {"method": "set_range", "max_distance": 4.0, "max_neighbours": 25}}]
_data = data_section("ESOLDataset", methods=_methods)
_training = training_section(epochs=300, batch_size=32, learning_rate=1e-3, scaler="StandardLabelScaler")
_models = {
    "HamNet": molnet_model("HamNet", output_units=1, output_activation="linear"),
    "CMPNN": molnet_model("CMPNN", output_units=1, output_activation="linear"),
    "DMPNN": molnet_model("DMPNN", output_units=1, output_activation="linear"),
    "GIN": molnet_model("GIN", output_units=1, output_activation="linear"),
    "AttentiveFP": molnet_model("AttentiveFP", output_units=1, output_activation="linear"),
    "PAiNN": molnet_model("PAiNN", output_units=1, output_activation="linear"),
    "INorp": molnet_model("INorp", output_units=1, output_activation="linear"),
    "GAT": molnet_model("GAT", output_units=1, output_activation="linear"),
    "GATv2": molnet_model("GATv2", output_units=1, output_activation="linear"),
    "Schnet": molnet_model("Schnet", output_units=1, output_activation="linear"),
    "Megnet": molnet_model("Megnet", output_units=1, output_activation="linear"),
    "GraphSAGE": molnet_model("GraphSAGE", output_units=1, output_activation="linear"),
    "GCN": molnet_model("GCN", output_units=1, output_activation="linear"),
    "DimeNetPP": molnet_model("DimeNetPP", output_units=1, output_activation="linear"),
    "NMPN": molnet_model("NMPN", output_units=1, output_activation="linear"),
    "MAT": molnet_model("MAT", output_units=1, output_activation="linear"),
    "MEGAN": molnet_model("MEGAN", output_units=1, output_activation="linear"),
    "RGCN": molnet_model("RGCN", output_units=1, output_activation="linear"),
    "GNNFilm": molnet_model("GNNFilm", output_units=1, output_activation="linear"),
    "HDNNP2nd": qm_model("HDNNP2nd", output_units=1),
}
hyper = compose(_models, _data, _training)
