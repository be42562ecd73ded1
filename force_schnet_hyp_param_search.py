"""Hyperband search for SchNet force training (parity: reference
``force_schnet_hyp_param_search.py``, objective val_force_loss)."""
from __future__ import annotations

from gcnn_keras_tpu.training.force_search import (
    parse_search_cli, run_force_search)
from force_schnet import CONFIG


def build_model(hp, cfg):
    from gcnn_keras_tpu.models.schnet import make_model
    from gcnn_keras_tpu.model.force import EnergyForceModel
    units = hp["units"]
    model = make_model(
        depth=hp["depth"], interaction_args={"units": units},
        gauss_args={"bins": hp["gauss_bins"],
                    "distance_max": cfg["schnet"]["gauss_distance"]},
        last_mlp={"units": [units, units // 2],
                  "activation": ["shifted_softplus", "shifted_softplus"]},
        output_mlp={"units": [units // 2, 1],
                    "activation": ["shifted_softplus", "linear"]})
    return EnergyForceModel(model)


SPACE = {
    "depth": {"int": [3, 6]},
    "units": {"choice": [64, 128, 256]},
    "gauss_bins": {"choice": [20, 25, 32]},
    "learning_rate": {"log_float": [1e-4, 5e-3]},
    "force_loss_weight": {"choice": [50.0, 200.0, 400.0]},
}

if __name__ == "__main__":
    args = parse_search_cli(CONFIG, "hyp_search_schnet")
    run_force_search(CONFIG, SPACE, build_model, args=args)
