"""Inverse/pairwise-distance baseline model energy+force training (parity:
reference ``force_inverse_distances.py``, 267 LoC)."""
from gcnn_keras_tpu.training.force_script import (
    run_force_training, parse_config_cli, DEFAULTS)

CONFIG = dict(DEFAULTS, model_prefix="model_inverse_distances_force",
              mlp_units=[128, 64, 1])


def build_model(cfg):
    from gcnn_keras_tpu.models.hdnnp2nd import make_model_inverse_distances
    from gcnn_keras_tpu.model.force import EnergyForceModel
    acts = ["swish"] * (len(cfg["mlp_units"]) - 1) + ["linear"]
    model = make_model_inverse_distances(
        mlp_kwargs={"units": cfg["mlp_units"], "num_relations": 96,
                    "activation": acts})
    return EnergyForceModel(model)


if __name__ == "__main__":
    cfg = parse_config_cli(CONFIG)
    run_force_training(build_model, cfg)
