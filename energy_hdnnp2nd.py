"""HDNNP2nd energy-only training (parity: reference ``energy_hdnnp2nd.py``,
296 LoC)."""
from gcnn_keras_tpu.training.force_script import (
    run_force_training, parse_config_cli)
from force_hdnnp2nd import CONFIG as _BASE, build_model

CONFIG = dict(_BASE, model_prefix="model_hdnnp2nd_energy",
              force_loss_weight=0.0, energy_loss_weight=1.0)

if __name__ == "__main__":
    cfg = parse_config_cli(CONFIG)
    run_force_training(build_model, cfg)
