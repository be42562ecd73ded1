"""HDNNP4th charge-only training (parity: reference ``charge_hdnnp4th.py``,
516 LoC): trains the electronegativity network against reference charges."""
from gcnn_keras_tpu.training.force_script import (
    run_force_training, parse_config_cli)
from force_hdnnp4th import CONFIG as _BASE, build_model

CONFIG = dict(_BASE, model_prefix="model_hdnnp4th_charge",
              force_loss_weight=0.0, energy_loss_weight=0.0,
              charge_loss_weight=1.0, need_esp=True, need_angles=True)

if __name__ == "__main__":
    cfg = parse_config_cli(CONFIG)
    run_force_training(build_model, cfg)
