"""HDNNP 4th generation — charge equilibration + long-range electrostatics
+ QM/MM embedding (Ko et al. 2021).

Parity: ``kgcnn/literature/HDNNP4th.py:59`` make_model_behler, body at
``:130-189``:
ACSF G2+G4 -> concat ESP -> BatchNorm -> RelationalMLP chi -> chi + esp ->
CENT charge solve + screened electrostatic energy -> QM/MM energy ->
concat(rep, q) -> RelationalMLP local energies -> sum-pool ->
E_total = E_short + E_elec + E_qmmm; outputs charge + energy.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..batch import GraphBatch
from ..layers.conv.acsf import ACSFG2, ACSFG4
from ..layers.conv.hdnnp_electro import (
    CENTChargePlusElectrostaticEnergy, electrostatic_qmmm_energy,
)
from ..layers.mlp import MLP, RelationalMLP
from ..layers.norm import GraphBatchNorm
from ..layers.aggr import pool_nodes_to_graph
from .registry import update_model_kwargs

Array = jax.Array

model_default_behler = dict(
    g2_kwargs={"eta": [0.0, 0.3], "rs": [0.0, 3.0], "rc": 10.0, "elements": [1, 6, 16]},
    g4_kwargs={"eta": [0.0, 0.3], "lamda": [-1.0, 1.0], "rc": 6.0,
               "zeta": [1.0, 8.0], "elements": [1, 6, 16], "multiplicity": 2.0},
    normalize_kwargs={},
    mlp_charge_kwargs={"units": [64, 64, 1], "num_relations": 96,
                       "activation": ["swish", "swish", "linear"]},
    mlp_local_kwargs={"units": [64, 64, 1], "num_relations": 96,
                      "activation": ["swish", "swish", "linear"]},
    cent_kwargs={},
    electrostatic_kwargs={"param_trainable": False},
    qmmm_kwargs={},
    node_pooling_args={"pooling_method": "sum"},
    output_embedding="charge+qm_energy",
    use_output_mlp=False,
    output_mlp={"units": [64, 1], "activation": ["swish", "linear"]},
    energy_mean_and_var=None,
)


# keras plumbing keys the reference's electrostatic layers accept but that
# have no counterpart here (initializer objects resolve through
# use_physical_params; constraints/regularizers are training-driver concerns)
_ELECTRO_IGNORED = {"name", "param_initializer", "param_regularizer",
                    "param_constraint", "output_to_tensor", "add_eps"}
_ELECTRO_KNOWN = {"param_trainable", "use_physical_params", "multiplicity",
                  "solver", "dense_impl", "cg_tol"} | _ELECTRO_IGNORED


def _electro_opts(cfg: Dict[str, Any]) -> Dict[str, Any]:
    """Merge cent_kwargs + electrostatic_kwargs like the reference's
    ``CENTChargePlusElectrostaticEnergy(**cent_kwargs, **electrostatic_kwargs)``
    (``HDNNP4th.py:158``), validating keys instead of cherry-picking."""
    merged = {**(cfg.get("cent_kwargs") or {}),
              **(cfg.get("electrostatic_kwargs") or {})}
    unknown = set(merged) - _ELECTRO_KNOWN
    if unknown:
        raise ValueError(
            f"Unknown electrostatic/cent kwargs: {sorted(unknown)}; "
            f"supported: {sorted(_ELECTRO_KNOWN - _ELECTRO_IGNORED)}")
    return {k: merged[k] for k in ("param_trainable", "use_physical_params",
                                   "multiplicity", "solver", "dense_impl",
                                   "cg_tol")
            if k in merged}


def _charge_energy_core(cfg: Dict[str, Any], batch: GraphBatch, rep: Array,
                        esp: Array, z: Array) -> Dict[str, Array]:
    """Shared chi -> CENT solve -> QM/MM -> local-energy block used by both
    the end-to-end behler model (``HDNNP4th.py:148-183``) and the learn model
    (``:420-432``). Must be called inside a compact parent scope."""
    chi = RelationalMLP(**cfg["mlp_charge_kwargs"], name="mlp_charge")(rep, z)
    chi_and_esp = chi[:, 0] + esp

    q, e_elec = CENTChargePlusElectrostaticEnergy(
        **_electro_opts(cfg), name="cent_electrostatic")(batch, chi_and_esp)
    e_qmmm = electrostatic_qmmm_energy(batch, q, esp)

    rep_charge = jnp.concatenate([rep, q[:, None]], axis=-1)
    local_e = RelationalMLP(**cfg["mlp_local_kwargs"], name="mlp_local")(rep_charge, z)
    local_e = local_e * batch.node_mask[:, None].astype(local_e.dtype)
    e_short = pool_nodes_to_graph(batch, local_e, **cfg["node_pooling_args"])

    e_total = e_short + e_elec + e_qmmm
    return {"charge": q, "output": e_total,
            "electrostatic_energy": e_elec, "qmmm_energy": e_qmmm,
            "short_range_energy": e_short}


class HDNNP4th(nn.Module):
    config: Dict[str, Any]

    @nn.compact
    def __call__(self, batch: GraphBatch, train: bool = False) -> Dict[str, Array]:
        cfg = self.config
        z = batch.nodes["node_number"].astype(jnp.int32)
        esp = batch.nodes.get("esp")
        if esp is None:
            esp = jnp.zeros((batch.n_node,), dtype=jnp.float32)
        esp = esp.reshape(batch.n_node, -1)[:, 0]

        rep_g2 = ACSFG2(**ACSFG2.make_param_table(**cfg["g2_kwargs"]),
                        name="acsf_g2")(batch, z=z)
        rep_g4 = ACSFG4(**ACSFG4.make_param_table(**cfg["g4_kwargs"]),
                        name="acsf_g4")(batch, z=z)
        rep = jnp.concatenate([rep_g2, rep_g4, esp[:, None]], axis=-1)

        # truthiness gate like the reference (HDNNP4th.py:146): an EMPTY
        # normalize_kwargs dict means NO normalization layer
        if cfg.get("normalize_kwargs"):
            rep = GraphBatchNorm(**cfg["normalize_kwargs"], name="norm")(
                rep, batch.node_mask, use_running_average=not train)

        result = _charge_energy_core(cfg, batch, rep, esp, z)
        q, e_total = result["charge"], result["output"]

        if cfg.get("energy_mean_and_var"):
            mean, var = cfg["energy_mean_and_var"]
            e_total = e_total * jnp.sqrt(var) + mean
        if cfg["use_output_mlp"]:
            e_total = MLP(cfg["output_mlp"]["units"],
                          activation=cfg["output_mlp"]["activation"],
                          name="output_mlp")(e_total)

        out_mode = cfg["output_embedding"]
        result["output"] = e_total
        if out_mode == "charge":
            result["output"] = q
        elif out_mode == "electrostatic_energy":
            result["output"] = result["electrostatic_energy"]
        # 'graph' / 'total_energy' / 'charge+qm_energy' keep energy in 'output'
        return result


def make_model_behler(**kwargs) -> HDNNP4th:
    cfg = update_model_kwargs(model_default_behler, kwargs)
    _electro_opts(cfg)  # fail fast on unknown electrostatic/cent keys
    return HDNNP4th(config=cfg)


def make_model(**kwargs) -> HDNNP4th:
    return make_model_behler(**kwargs)


model_default_rep = dict(
    g2_kwargs=model_default_behler["g2_kwargs"],
    g4_kwargs=model_default_behler["g4_kwargs"],
)


class HDNNP4thRep(nn.Module):
    """Pure ACSF-representation model (parity: ``kgcnn/literature/
    HDNNP4th.py:315`` make_model_rep): concat(G2, G4) per node, no learned
    parameters. Used to precompute symmetry functions once per dataset so
    the learnable part (``make_model_learn``) can train without recomputing
    the angular sums every step."""
    config: Dict[str, Any]

    @nn.compact
    def __call__(self, batch: GraphBatch, train: bool = False) -> Dict[str, Array]:
        cfg = self.config
        z = batch.nodes["node_number"].astype(jnp.int32)
        rep_g2 = ACSFG2(**ACSFG2.make_param_table(**cfg["g2_kwargs"]),
                        name="acsf_g2")(batch, z=z)
        rep_g4 = ACSFG4(**ACSFG4.make_param_table(**cfg["g4_kwargs"]),
                        name="acsf_g4")(batch, z=z)
        rep = jnp.concatenate([rep_g2, rep_g4], axis=-1)
        return {"output": rep, "rep": rep}


def make_model_rep(**kwargs) -> HDNNP4thRep:
    cfg = update_model_kwargs(model_default_rep, kwargs)
    return HDNNP4thRep(config=cfg)


model_default_learn = dict(
    normalize_kwargs={},
    mlp_charge_kwargs=model_default_behler["mlp_charge_kwargs"],
    mlp_local_kwargs=model_default_behler["mlp_local_kwargs"],
    cent_kwargs={},
    electrostatic_kwargs={"param_trainable": False},
    qmmm_kwargs={},
    node_pooling_args={"pooling_method": "sum"},
    output_embedding="graph",
    use_output_mlp=False,
    output_mlp={"units": [64, 1], "activation": ["swish", "linear"]},
)


class HDNNP4thLearn(nn.Module):
    """Learnable half of the rep/learn split (parity: ``kgcnn/literature/
    HDNNP4th.py:337`` make_model_learn): consumes a precomputed symmetry-
    function representation ``nodes['rep']`` plus ``nodes['esp']`` and runs
    concat(rep, esp) -> optional BatchNorm -> RelationalMLP chi ->
    chi + esp -> CENT solve + electrostatics -> QM/MM -> concat(rep_esp, q)
    -> RelationalMLP local energies -> sum-pool ->
    E = E_short + E_elec + E_qmmm (reference ``:420-432``)."""
    config: Dict[str, Any]

    @nn.compact
    def __call__(self, batch: GraphBatch, train: bool = False) -> Dict[str, Array]:
        cfg = self.config
        z = batch.nodes["node_number"].astype(jnp.int32)
        rep = batch.nodes["rep"]
        esp = batch.nodes.get("esp")
        if esp is None:
            esp = jnp.zeros((batch.n_node,), dtype=rep.dtype)
        esp = esp.reshape(batch.n_node, -1)[:, 0]

        rep_esp = jnp.concatenate([rep, esp[:, None]], axis=-1)
        if cfg.get("normalize_kwargs"):
            rep_esp = GraphBatchNorm(**cfg["normalize_kwargs"], name="norm")(
                rep_esp, batch.node_mask, use_running_average=not train)

        result = _charge_energy_core(cfg, batch, rep_esp, esp, z)

        if cfg["use_output_mlp"]:
            result["output"] = MLP(cfg["output_mlp"]["units"],
                                   activation=cfg["output_mlp"]["activation"],
                                   name="output_mlp")(result["output"])
        return result


def make_model_learn(**kwargs) -> HDNNP4thLearn:
    cfg = update_model_kwargs(model_default_learn, kwargs)
    # reference make_model_learn raises for any non-'graph' embedding
    # (HDNNP4th.py:436-440)
    if cfg.get("output_embedding", "graph") != "graph":
        raise ValueError("Unsupported output embedding for mode `HDNNP4th` "
                         "make_model_learn: only 'graph' is supported.")
    _electro_opts(cfg)  # fail fast on unknown electrostatic/cent keys
    return HDNNP4thLearn(config=cfg)


def make_model_behler_charge_separat(**kwargs) -> Tuple[HDNNP4th, HDNNP4th]:
    """Two-model variant (HDNNP4th.py:192): one model trained for charges,
    one for energies. Returns (charge_model, energy_model) sharing config."""
    cfg_charge = update_model_kwargs(model_default_behler, kwargs)
    cfg_charge = dict(cfg_charge, output_embedding="charge")
    cfg_energy = update_model_kwargs(model_default_behler, kwargs)
    return HDNNP4th(config=cfg_charge), HDNNP4th(config=cfg_energy)
