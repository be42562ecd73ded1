"""Hyperband search for PAiNN force training (parity: reference
``force_painn_hyp_param_search.py``, objective val_force_loss)."""
from __future__ import annotations

from gcnn_keras_tpu.training.force_search import (
    parse_search_cli, run_force_search)
from force_painn import CONFIG


def build_model(hp, cfg):
    from gcnn_keras_tpu.models.painn import make_model
    from gcnn_keras_tpu.model.force import EnergyForceModel
    units = hp["units"]
    model = make_model(
        depth=hp["depth"],
        conv_args={"units": units, "cutoff": None},
        update_args={"units": units},
        input_embedding={"node": {"output_dim": units}},
        bessel_basis={"num_radial": hp["num_radial"],
                      "cutoff": cfg.get("cutoff", 5.0)},
        output_mlp={"units": [units, 1], "activation": ["swish", "linear"]})
    return EnergyForceModel(model)


SPACE = {
    "depth": {"int": [2, 4]},
    "units": {"choice": [64, 128, 256]},
    "num_radial": {"choice": [16, 20, 32]},
    "learning_rate": {"log_float": [1e-4, 5e-3]},
    "force_loss_weight": {"choice": [50.0, 200.0, 400.0]},
}

if __name__ == "__main__":
    args = parse_search_cli(CONFIG, "hyp_search_painn")
    run_force_search(CONFIG, SPACE, build_model, args=args)
