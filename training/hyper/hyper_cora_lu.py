"""Hyperparameter configs for Cora (Lu et al., 7-class) (parity: reference
``training/hyper/hyper_cora_lu.py`` — same dataset/model coverage, configs in this
framework's schema)."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

from gcnn_keras_tpu.training.hyper_templates import (
    molnet_model, qm_model, crystal_model, force_model, citation_model,
    data_section, training_section, compose)

_data = data_section("CoraLuDataset")
_training = training_section(epochs=300, batch_size=1, learning_rate=1e-2, loss="categorical_crossentropy")
_models = {
    "GATv2": citation_model("GATv2", num_classes=7),
    "GAT": citation_model("GAT", num_classes=7),
    "GCN": citation_model("GCN", num_classes=7),
    "GraphSAGE": citation_model("GraphSAGE", num_classes=7),
    "GIN": citation_model("GIN", num_classes=7),
}
hyper = compose(_models, _data, _training)
