"""Energy -> force wrapper via autodiff.

Replaces the reference's ``EnergyForceModel`` (``kgcnn/model/force.py:11``),
which pads ragged coordinates, watches them in a persistent GradientTape and
calls ``tape.batch_jacobian(energy, coords)``. Per-graph energies are scalars,
so on flat batches a single reverse pass over ``sum_g E_g`` yields ALL forces
at once (``d sum E / d r_i`` only receives contributions from atom i's own
graph) — strictly cheaper than batch_jacobian and jit/TPU-native.

Also implements the fork's ESP force coupling (``model/force.py:153-183``):
``F_i = -dE/dr_i - (dE/dPhi_i) * dPhi_i/dr_i`` with the ESP gradient
supplied as a node input.
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp

from ..batch import GraphBatch

Array = jax.Array


class EnergyForceModel:
    """Wraps any energy model (flax module over GraphBatch).

    ``apply(params, batch)`` returns a dict with at least ``energy`` (G, S)
    and ``force`` (N, 3) (or (S, N, 3) for S > 1 energy states), passing
    through all other outputs of the inner model (e.g. HDNNP4th charges).
    """

    def __init__(self, energy_model, energy_output_key: str = "output",
                 coordinates_key: str = "node_coordinates",
                 esp_key: str = "esp", esp_grad_key: str = "esp_grad",
                 use_esp_coupling: bool = False,
                 is_physical_force: bool = True):
        self.energy_model = energy_model
        self.energy_output_key = energy_output_key
        self.coordinates_key = coordinates_key
        self.esp_key = esp_key
        self.esp_grad_key = esp_grad_key
        self.use_esp_coupling = use_esp_coupling
        self.sign = -1.0 if is_physical_force else 1.0

    def init(self, rng, batch: GraphBatch, **kwargs):
        return self.energy_model.init(rng, batch, **kwargs)

    def apply(self, variables, batch: GraphBatch, **kwargs) -> Dict[str, Array]:
        coords = batch.nodes[self.coordinates_key]
        use_esp = self.use_esp_coupling and self.esp_key in batch.nodes

        def energy_fn(c, esp):
            new_nodes = {self.coordinates_key: c}
            if use_esp:
                new_nodes[self.esp_key] = esp
            b = batch.replace_nodes(**new_nodes)
            out = self.energy_model.apply(variables, b, **kwargs)
            e = out[self.energy_output_key]
            gmask = batch.globals["graph_mask"].astype(e.dtype)
            e = e * gmask.reshape(gmask.shape + (1,) * (e.ndim - 1))
            return jnp.sum(e), out

        if use_esp:
            esp = batch.nodes[self.esp_key]
            (total_e, out), (de_dr, de_desp) = jax.value_and_grad(
                energy_fn, argnums=(0, 1), has_aux=True)(coords, esp)
        else:
            (total_e, out), de_dr = jax.value_and_grad(
                energy_fn, argnums=0, has_aux=True)(coords, None)

        force = self.sign * de_dr
        if use_esp:
            esp_grad = batch.nodes[self.esp_grad_key]  # (N, 3) = dPhi_i/dr_i
            de_desp_b = de_desp.reshape(de_desp.shape + (1,) * (esp_grad.ndim - de_desp.ndim))
            force = force + self.sign * de_desp_b * esp_grad
        force = force * batch.node_mask.reshape(
            batch.node_mask.shape + (1,) * (force.ndim - 1)).astype(force.dtype)

        result = dict(out)
        result["energy"] = out[self.energy_output_key]
        result["force"] = force
        return result

    def apply_multistate(self, variables, batch: GraphBatch, num_states: int,
                         **kwargs) -> Dict[str, Array]:
        """S > 1 energy states: per-state forces via ``jacrev`` over the
        vector of state-summed energies -> (S, N, 3) (reference output
        (batch, states, N, 3), ``model/force.py:176``)."""
        coords = batch.nodes[self.coordinates_key]

        def energies(c):
            b = batch.replace_nodes(**{self.coordinates_key: c})
            out = self.energy_model.apply(variables, b, **kwargs)
            e = out[self.energy_output_key]
            gmask = batch.globals["graph_mask"].astype(e.dtype)
            return jnp.sum(e * gmask[:, None], axis=0), out

        jac, out = jax.jacrev(energies, has_aux=True)(coords)  # (S, N, 3)
        force = self.sign * jac * batch.node_mask[None, :, None].astype(jac.dtype)
        result = dict(out)
        result["energy"] = out[self.energy_output_key]
        result["force"] = force
        return result
