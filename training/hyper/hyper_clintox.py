"""Hyperparameter configs for ClinTox (toxicity classification) (parity: reference
``training/hyper/hyper_clintox.py`` — same dataset/model coverage, configs in this
framework's schema)."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

from gcnn_keras_tpu.training.hyper_templates import (
    molnet_model, qm_model, crystal_model, force_model, citation_model,
    data_section, training_section, compose)

_methods = [{"map_list": {"method": "set_range", "max_distance": 4.0, "max_neighbours": 25}}]
_data = data_section("ClinToxDataset", methods=_methods)
_training = training_section(epochs=50, batch_size=32, learning_rate=1e-3, loss="binary_crossentropy")
_models = {
    "GraphSAGE": molnet_model("GraphSAGE", output_units=1, output_activation="sigmoid"),
    "DMPNN": molnet_model("DMPNN", output_units=1, output_activation="sigmoid"),
    "CMPNN": molnet_model("CMPNN", output_units=1, output_activation="sigmoid"),
    "AttentiveFP": molnet_model("AttentiveFP", output_units=1, output_activation="sigmoid"),
    "GIN": molnet_model("GIN", output_units=1, output_activation="sigmoid"),
    "INorp": molnet_model("INorp", output_units=1, output_activation="sigmoid"),
    "GAT": molnet_model("GAT", output_units=1, output_activation="sigmoid"),
    "GATv2": molnet_model("GATv2", output_units=1, output_activation="sigmoid"),
    "Schnet": molnet_model("Schnet", output_units=1, output_activation="sigmoid"),
    "MEGAN": molnet_model("MEGAN", output_units=1, output_activation="sigmoid"),
}
hyper = compose(_models, _data, _training)
