"""Hyperband search for the HDNNP4th charge (electronegativity) network
(parity: reference ``charge_hyp_param_search.py``, objective
val_charge_loss)."""
from __future__ import annotations

from gcnn_keras_tpu.training.force_search import (
    parse_search_cli, run_force_search)
from charge_hdnnp4th import CONFIG
from force_hdnnp4th import build_model as _build_hdnnp4th, load_dataset


def build_model(hp, cfg):
    cfg = dict(cfg)
    cfg["mlp_units"] = [hp["mlp_width"]] * hp["mlp_depth"] + [1]
    return _build_hdnnp4th(cfg)


SPACE = {
    "mlp_width": {"choice": [32, 64, 128]},
    "mlp_depth": {"int": [2, 3]},
    "learning_rate": {"log_float": [1e-4, 5e-3]},
}

if __name__ == "__main__":
    args = parse_search_cli(CONFIG, "hyp_search_charge")
    run_force_search(CONFIG, SPACE, build_model,
                     objective="val_charge_mae", args=args,
                     load_dataset=load_dataset)
