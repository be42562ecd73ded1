"""Hyperparameter configs for MatProject metal classification (parity: reference
``training/hyper/hyper_mp_is_metal.py`` — same dataset/model coverage, configs in this
framework's schema)."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

from gcnn_keras_tpu.training.hyper_templates import (
    molnet_model, qm_model, crystal_model, force_model, citation_model,
    data_section, training_section, compose)

_methods = [{"read_in_memory": {"radius": 5.0, "max_neighbours": 17}}]
_data = data_section("MatProjectIsMetalDataset", methods=_methods)
_training = training_section(epochs=100, batch_size=64, learning_rate=5e-4, loss="binary_crossentropy")
_models = {
    "Megnet.make_crystal_model": crystal_model("Megnet", overrides={"output_mlp": {"activation": ["swish", "swish", "sigmoid"]}}),
    "Schnet.make_crystal_model": crystal_model("Schnet", overrides={"output_mlp": {"activation": ["swish", "swish", "sigmoid"]}}),
    "PAiNN.make_crystal_model": crystal_model("PAiNN", overrides={"output_mlp": {"activation": ["swish", "swish", "sigmoid"]}}),
    "DimeNetPP.make_crystal_model": crystal_model("DimeNetPP"),
    "CGCNN.make_crystal_model": crystal_model("CGCNN", overrides={"output_mlp": {"activation": ["swish", "swish", "sigmoid"]}}),
    "MEGAN": qm_model("MEGAN"),
}
hyper = compose(_models, _data, _training)
