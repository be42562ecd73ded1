"""HDNNP2nd energy+force training (parity: reference ``force_hdnnp2nd.py``,
553 LoC — scaffold factored into force_script.py)."""
from gcnn_keras_tpu.training.force_script import (
    run_force_training, parse_config_cli, DEFAULTS)

CONFIG = dict(DEFAULTS, model_prefix="model_hdnnp2nd_force",
              need_angles=True,
              elements=[1, 6, 8],
              g2={"eta": [0.0, 0.3], "rs": [0.0, 3.0], "rc": 10.0},
              g4={"eta": [0.0, 0.3], "lamda": [-1.0, 1.0],
                  "zeta": [1.0, 8.0], "rc": 6.0},
              mlp_units=[64, 64, 1])


def build_model(cfg):
    from gcnn_keras_tpu.models.hdnnp2nd import make_model_behler
    from gcnn_keras_tpu.model.force import EnergyForceModel
    elements = cfg["elements"]
    num_rel = max(elements) + 1
    acts = ["swish"] * (len(cfg["mlp_units"]) - 1) + ["linear"]
    model = make_model_behler(
        g2_kwargs={**cfg["g2"], "elements": elements},
        g4_kwargs={**cfg["g4"], "elements": elements, "multiplicity": 2.0},
        mlp_kwargs={"units": cfg["mlp_units"], "num_relations": num_rel,
                    "activation": acts})
    return EnergyForceModel(model)


if __name__ == "__main__":
    cfg = parse_config_cli(CONFIG)
    run_force_training(build_model, cfg)
