"""HDNNP4th energy-only training (parity: reference ``energy_hdnnp4th.py``,
422 LoC)."""
from gcnn_keras_tpu.training.force_script import (
    run_force_training, parse_config_cli)
from force_hdnnp4th import CONFIG as _BASE, build_model

CONFIG = dict(_BASE, model_prefix="model_hdnnp4th_energy",
              force_loss_weight=0.0, charge_loss_weight=1.0,
              energy_loss_weight=1.0, need_esp=True, need_angles=True)

if __name__ == "__main__":
    cfg = parse_config_cli(CONFIG)
    run_force_training(build_model, cfg)
