"""Force-path golden parity against the reference ``EnergyForceModel``.

Fixtures ``tests/assets/ref_force_*.npz`` were recorded by
``tools/record_force_goldens.py``: the reference energy models wrapped in the
reference ``EnergyForceModel`` (``/root/reference/kgcnn/model/force.py:136-201``)
with the fork's exact wrapper config (``is_physical_force=False``,
``output_squeeze_states=True``; HDNNP4th exercises the ESP-gradient coupling
branch ``force.py:179-183``) on six molecules of 3-14 atoms.

Here the recorded weights are copied into this framework's models, wrapped in
our one-reverse-pass ``EnergyForceModel``, and the energies, FORCES (and for
HDNNP4th charges) must match — plus a padding-size sweep proving force
invariance under different static batch shapes.
"""
import os

import numpy as np
import pytest

import jax

from gcnn_keras_tpu.batch import batch_graphs
from gcnn_keras_tpu.model.force import EnergyForceModel

from tests.test_reference_parity import (
    _apply_mapping, broadcast_relational, hdnnp2nd_mapping, hdnnp4th_mapping,
    painn_mapping, schnet_mapping)

ASSETS = os.path.join(os.path.dirname(__file__), "assets")


def _load_force(name):
    path = os.path.join(ASSETS, f"ref_force_{name}.npz")
    if not os.path.exists(path):
        pytest.skip(f"{path} not recorded")
    d = np.load(path)
    n = int(d["n_graphs"])
    graphs = []
    for i in range(n):
        g = {k[len(f"g{i}_"):]: d[k] for k in d.files
             if k.startswith(f"g{i}_")}
        graphs.append(g)
    weights = [d[k] for k in sorted(d.files)
               if k.startswith("w") and not k.startswith("wname")]
    outs = [d[f"out{i}"] for i in range(8) if f"out{i}" in d.files]
    return graphs, weights, outs


def _prep(graphs, keep_angles=False, keep_esp=False):
    prepared = []
    for g in graphs:
        p = {"node_number": g["z"].astype(np.int64),
             "node_coordinates": g["xyz"],
             "edge_indices": g["edge_indices"]}
        if keep_angles:
            p["angle_indices_nodes"] = g["angle_indices_nodes"]
        if keep_esp:
            p["esp"] = g["esp"]
            p["esp_grad"] = g["esp_grad"]
            p["total_charge"] = g["total_charge"]
        prepared.append(p)
    return prepared


def _check_forces(force_flat, batch, graphs, ref_force, rtol, atol):
    """Compare our flat (N_pad, 3) forces to the reference's padded
    (G, N_max, 3) output, per molecule."""
    f = np.asarray(force_flat)
    nm = np.asarray(batch.node_mask)
    gid = np.asarray(batch.graph_id)
    for i, g in enumerate(graphs):
        ours = f[nm & (gid == i)]
        ref = ref_force[i, :len(g["z"])]
        np.testing.assert_allclose(ours, ref, rtol=rtol, atol=atol,
                                   err_msg=f"molecule {i}")


def test_schnet_force_matches_reference():
    graphs, weights, (ref_eng, ref_force) = _load_force("schnet")
    batch = batch_graphs(_prep(graphs))

    from gcnn_keras_tpu.models.schnet import make_model
    model = make_model(depth=2)
    fmodel = EnergyForceModel(model, is_physical_force=False)
    params = fmodel.init(jax.random.PRNGKey(0), batch)
    params = _apply_mapping(params, weights, schnet_mapping(depth=2))

    out = fmodel.apply(params, batch)
    eng = np.asarray(out["energy"])[:len(graphs)]
    np.testing.assert_allclose(eng, ref_eng, rtol=1e-4, atol=2e-5)
    _check_forces(out["force"], batch, graphs, ref_force,
                  rtol=1e-4, atol=1e-4)

    # padding-size sweep: forces must be invariant to the static batch shape
    big = batch_graphs(_prep(graphs), n_node_pad=256,
                       n_edge_pad=batch.n_edge + 512)
    out2 = fmodel.apply(params, big)
    _check_forces(out2["force"], big, graphs, ref_force,
                  rtol=1e-4, atol=1e-4)


def test_painn_force_matches_reference():
    graphs, weights, (ref_eng, ref_force) = _load_force("painn")
    batch = batch_graphs(_prep(graphs))

    from gcnn_keras_tpu.models.painn import make_model
    model = make_model(depth=2)
    fmodel = EnergyForceModel(model, is_physical_force=False)
    params = fmodel.init(jax.random.PRNGKey(0), batch)
    np.testing.assert_allclose(weights[1], np.arange(1, 21) * np.pi,
                               rtol=1e-6)
    params = _apply_mapping(params, weights, painn_mapping(depth=2))

    out = fmodel.apply(params, batch)
    eng = np.asarray(out["energy"])[:len(graphs)]
    np.testing.assert_allclose(eng, ref_eng, rtol=1e-4, atol=2e-5)
    _check_forces(out["force"], batch, graphs, ref_force,
                  rtol=1e-4, atol=1e-4)


def test_painn_force_finite_on_symmetric_molecule():
    """On a PERFECTLY tetrahedral CH4 the reference's batch_jacobian forces
    are NaN (equivariant features cancel to exactly zero on the central atom
    and d(norm)/dv at v=0 poisons the TF gradient). Our norm guards keep the
    one-reverse-pass forces finite — a deliberate improvement, recorded here
    so the behavior difference stays visible."""
    ch4 = {
        "node_number": np.array([6, 1, 1, 1, 1], dtype=np.int64),
        "node_coordinates": np.array(
            [[0.0, 0.0, 0.0], [0.6291, 0.6291, 0.6291],
             [-0.6291, -0.6291, 0.6291], [-0.6291, 0.6291, -0.6291],
             [0.6291, -0.6291, -0.6291]], dtype=np.float32),
    }
    n = 5
    ch4["edge_indices"] = np.array(
        [[i, j] for i in range(n) for j in range(n) if i != j], dtype=np.int64)
    batch = batch_graphs([ch4])

    from gcnn_keras_tpu.models.painn import make_model
    model = make_model(depth=2)
    fmodel = EnergyForceModel(model, is_physical_force=False)
    params = fmodel.init(jax.random.PRNGKey(0), batch)
    out = fmodel.apply(params, batch)
    assert np.isfinite(np.asarray(out["force"])).all()


HDNNP_KW = dict(
    g2_kwargs={"eta": [0.0, 0.3], "rs": [0.0, 3.0], "rc": 10.0,
               "elements": [1, 6, 8]},
    g4_kwargs={"eta": [0.0, 0.3], "lamda": [-1.0, 1.0], "rc": 6.0,
               "zeta": [1.0, 8.0], "elements": [1, 6, 8],
               "multiplicity": 2.0},
    normalize_kwargs={},
)


def test_hdnnp2nd_force_matches_reference():
    graphs, weights, (ref_eng, ref_force) = _load_force("hdnnp2nd")
    batch = batch_graphs(_prep(graphs, keep_angles=True))

    from gcnn_keras_tpu.models.hdnnp2nd import make_model_behler
    model = make_model_behler(
        mlp_kwargs={"units": [32, 32, 1], "num_relations": 9,
                    "activation": ["swish", "swish", "linear"]},
        **HDNNP_KW)
    fmodel = EnergyForceModel(model, is_physical_force=False)
    params = fmodel.init(jax.random.PRNGKey(0), batch, train=False)
    mapping, bcast = hdnnp2nd_mapping()
    params = _apply_mapping(params, broadcast_relational(weights, bcast),
                            mapping)

    out = fmodel.apply(params, batch, train=False)
    eng = np.asarray(out["energy"])[:len(graphs)]
    np.testing.assert_allclose(eng, ref_eng, rtol=1e-4, atol=5e-5)
    _check_forces(out["force"], batch, graphs, ref_force,
                  rtol=1e-4, atol=2e-4)

    big = batch_graphs(_prep(graphs, keep_angles=True),
                       n_node_pad=256, n_edge_pad=batch.n_edge + 512,
                       n_angle_pad=(batch.angles.shape[0] + 1024
                                    if batch.angles is not None else None))
    out2 = fmodel.apply(params, big, train=False)
    _check_forces(out2["force"], big, graphs, ref_force,
                  rtol=1e-4, atol=2e-4)


def test_hdnnp4th_force_charge_esp_coupling_matches_reference():
    """The flagship: energy+force+charge parity INCLUDING the ESP-gradient
    force coupling (reference ``model/force.py:179-183``: the recorded
    force is dE/dr + (dE/dPhi) * dPhi/dr)."""
    graphs, weights, (ref_charge, ref_eng, ref_force) = _load_force("hdnnp4th")
    batch = batch_graphs(_prep(graphs, keep_angles=True, keep_esp=True),
                         global_keys=("total_charge",))

    from gcnn_keras_tpu.models.hdnnp4th import make_model_behler
    model = make_model_behler(
        mlp_charge_kwargs={"units": [32, 32, 1], "num_relations": 9,
                           "activation": ["swish", "swish", "linear"]},
        mlp_local_kwargs={"units": [32, 32, 1], "num_relations": 9,
                          "activation": ["swish", "swish", "linear"]},
        **HDNNP_KW)
    fmodel = EnergyForceModel(model, use_esp_coupling=True,
                              is_physical_force=False)
    params = fmodel.init(jax.random.PRNGKey(0), batch, train=False)
    mapping, bcast = hdnnp4th_mapping()
    params = _apply_mapping(params, broadcast_relational(weights, bcast),
                            mapping)

    out = fmodel.apply(params, batch, train=False)
    eng = np.asarray(out["energy"])[:len(graphs)]
    np.testing.assert_allclose(eng, ref_eng, rtol=1e-4, atol=5e-5)

    q = np.asarray(out["charge"])
    nm = np.asarray(batch.node_mask)
    gid = np.asarray(batch.graph_id)
    for i, g in enumerate(graphs):
        ours = q[nm & (gid == i)]
        ref = ref_charge[i, :len(g["z"]), 0]
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=5e-5)

    _check_forces(out["force"], batch, graphs, ref_force,
                  rtol=1e-4, atol=5e-4)

    # padding sweep incl. larger Qeq matrix padding
    big = batch_graphs(_prep(graphs, keep_angles=True, keep_esp=True),
                       global_keys=("total_charge",),
                       n_node_pad=256, n_edge_pad=batch.n_edge + 512,
                       n_angle_pad=batch.angles.shape[0] + 1024)
    out2 = fmodel.apply(params, big, train=False)
    _check_forces(out2["force"], big, graphs, ref_force,
                  rtol=1e-4, atol=5e-4)
