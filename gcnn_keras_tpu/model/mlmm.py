"""ML/MM energy-force wrapper (parity: ``kgcnn/model/mlmm.py:8``
MLMMEnergyForceModel): adds QM/MM point-charge electrostatic energy and
force corrections around an EnergyForceModel using the model's predicted
charges and the MM ESP / ESP-gradient inputs.
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from ..batch import GraphBatch
from ..layers.conv.hdnnp_electro import (
    electrostatic_qmmm_energy, electrostatic_qmmm_force,
)
from .force import EnergyForceModel

Array = jax.Array


class MLMMEnergyForceModel:
    """Wraps an EnergyForceModel whose inner model predicts charges: the
    QM/MM coupling terms are added OUTSIDE the learned model, so a potential
    trained in vacuum can be embedded in an MM environment."""

    def __init__(self, energy_force_model: EnergyForceModel,
                 esp_key: str = "esp", esp_grad_key: str = "esp_grad",
                 charge_key: str = "charge"):
        self.inner = energy_force_model
        self.esp_key = esp_key
        self.esp_grad_key = esp_grad_key
        self.charge_key = charge_key

    def init(self, rng, batch: GraphBatch, **kwargs):
        return self.inner.init(rng, batch, **kwargs)

    def apply(self, variables, batch: GraphBatch, **kwargs) -> Dict[str, Array]:
        out = self.inner.apply(variables, batch, **kwargs)
        q = out.get(self.charge_key)
        if q is None or self.esp_key not in batch.nodes:
            return out
        esp = batch.nodes[self.esp_key]
        e_qmmm = electrostatic_qmmm_energy(batch, q, esp)
        result = dict(out)
        result["energy"] = out["energy"] + e_qmmm
        if self.esp_grad_key in batch.nodes and "force" in out:
            f_qmmm = electrostatic_qmmm_force(q, batch.nodes[self.esp_grad_key])
            result["force"] = out["force"] + f_qmmm * batch.node_mask[:, None].astype(
                f_qmmm.dtype)
        result["qmmm_energy_correction"] = e_qmmm
        return result
