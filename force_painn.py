"""PAiNN energy+force training (parity: reference ``force_painn.py``, 544
LoC — scaffold factored into ``gcnn_keras_tpu/training/force_script.py``)."""
from gcnn_keras_tpu.training.force_script import (
    run_force_training, parse_config_cli, DEFAULTS)

CONFIG = dict(DEFAULTS, model_prefix="model_painn_force",
              painn={"depth": 3, "units": 128, "num_radial": 20, "cutoff": 5.0})


def build_model(cfg):
    from gcnn_keras_tpu.models.painn import make_model
    from gcnn_keras_tpu.model.force import EnergyForceModel
    p = cfg["painn"]
    model = make_model(
        depth=p["depth"], conv_args={"units": p["units"], "cutoff": p["cutoff"]},
        update_args={"units": p["units"]},
        input_embedding={"node": {"output_dim": p["units"]}},
        bessel_basis={"num_radial": p["num_radial"], "cutoff": p["cutoff"]},
        output_mlp={"units": [p["units"], 1], "activation": ["swish", "linear"]})
    return EnergyForceModel(model)


if __name__ == "__main__":
    cfg = parse_config_cli(CONFIG)
    run_force_training(build_model, cfg)
