"""Hyperparameter configs for VGD mock (XAI) (parity: reference
``training/hyper/hyper_vgd_mock.py`` — same dataset/model coverage, configs in this
framework's schema)."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

from gcnn_keras_tpu.training.hyper_templates import (
    molnet_model, qm_model, crystal_model, force_model, citation_model,
    data_section, training_section, compose)

_data = data_section("VgdMockDataset")
_training = training_section(epochs=100, batch_size=16, learning_rate=1e-3)
_models = {
    "MEGAN": molnet_model("MEGAN", output_units=1),
    "GCN": molnet_model("GCN", output_units=1),
}
hyper = compose(_models, _data, _training)
