"""SchNet energy+force training (parity: reference ``force_schnet.py``, 556
LoC — scaffold factored into ``gcnn_keras_tpu/training/force_script.py``)."""
from gcnn_keras_tpu.training.force_script import (
    run_force_training, parse_config_cli, DEFAULTS)

CONFIG = dict(DEFAULTS, model_prefix="model_schnet_force",
              schnet={"depth": 4, "units": 128, "gauss_bins": 25,
                      "gauss_distance": 5.0})


def build_model(cfg):
    from gcnn_keras_tpu.models.schnet import make_model
    from gcnn_keras_tpu.model.force import EnergyForceModel
    s = cfg["schnet"]
    model = make_model(
        depth=s["depth"], interaction_args={"units": s["units"]},
        gauss_args={"bins": s["gauss_bins"], "distance_max": s["gauss_distance"]},
        last_mlp={"units": [s["units"], s["units"] // 2],
                  "activation": ["shifted_softplus", "shifted_softplus"]},
        output_mlp={"units": [s["units"] // 2, 1],
                    "activation": ["shifted_softplus", "linear"]})
    return EnergyForceModel(model)


if __name__ == "__main__":
    cfg = parse_config_cli(CONFIG)
    run_force_training(build_model, cfg)
