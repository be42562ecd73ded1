"""Smoke tier (VERDICT r3 item 6): `pytest -m smoke` is the <2-min COLD
gate — package imports (test_imports), batch invariants (test_batch), one
tiny forward per core model family, and one optimizer step through the
Trainer. The full suite stays the correctness bar (~25 min cold, ~1 min
warm via /tmp/jax_cache_tests)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from gcnn_keras_tpu.batch import batch_graphs
from gcnn_keras_tpu.graph.preprocess import set_range, set_angle

pytestmark = pytest.mark.smoke


def _mols(n_mols=3, seed=0, with_esp=False):
    rs = np.random.RandomState(seed)
    graphs = []
    for _ in range(n_mols):
        n = rs.randint(4, 7)
        g = {"node_number": rs.choice([1, 6, 8], size=n),
             "node_coordinates": (rs.randn(n, 3) * 1.5).astype(np.float32),
             "energy": np.array([rs.randn()], dtype=np.float32)}
        g = set_range(g, max_distance=5.0, max_neighbours=8)
        g["edge_indices"] = g.pop("range_indices")
        if with_esp:
            g = set_angle(g, range_indices="edge_indices")
            g["esp"] = (rs.randn(n) * 0.01).astype(np.float32)
            g["esp_grad"] = (rs.randn(n, 3) * 0.01).astype(np.float32)
            g["total_charge"] = np.zeros(1, np.float32)
        graphs.append(g)
    return graphs


def _tiny_batch(with_esp=False):
    keys = ("energy", "total_charge") if with_esp else ("energy",)
    return batch_graphs(_mols(with_esp=with_esp), global_keys=keys)


def test_schnet_forward_finite():
    from gcnn_keras_tpu.models.schnet import make_model
    b = _tiny_batch()
    m = make_model(depth=1, interaction_args={"units": 16},
                   gauss_args={"bins": 8, "distance_max": 5.0},
                   last_mlp={"units": [8], "activation": ["shifted_softplus"]},
                   output_mlp={"units": [1], "activation": ["linear"]})
    out = m.apply(m.init(jax.random.PRNGKey(0), b), b)["output"]
    assert np.isfinite(np.asarray(out)).all()


def test_painn_forward_finite():
    from gcnn_keras_tpu.models.painn import make_model
    b = _tiny_batch()
    m = make_model(depth=1,
                   input_embedding={"node": {"input_dim": 95,
                                             "output_dim": 16}},
                   conv_args={"units": 16, "cutoff": None,
                              "conv_pool": "sum"},
                   update_args={"units": 16},
                   bessel_basis={"num_radial": 4, "cutoff": 5.0,
                                 "envelope_exponent": 5},
                   output_mlp={"units": [16, 1],
                               "activation": ["swish", "linear"]})
    out = m.apply(m.init(jax.random.PRNGKey(0), b), b)["output"]
    assert np.isfinite(np.asarray(out)).all()


def test_gin_forward_finite():
    from gcnn_keras_tpu.models.gin import make_model
    b = _tiny_batch()
    m = make_model(depth=1,
                   gin_mlp={"units": [16], "activation": ["relu"]},
                   last_mlp={"units": [8], "activation": ["relu"]},
                   output_mlp={"units": [1], "activation": ["linear"]})
    out = m.apply(m.init(jax.random.PRNGKey(0), b), b)["output"]
    assert np.isfinite(np.asarray(out)).all()


def test_hdnnp4th_forward_charge_conservation():
    from gcnn_keras_tpu.models.hdnnp4th import make_model_behler
    b = _tiny_batch(with_esp=True)
    m = make_model_behler(
        g2_kwargs={"eta": [0.3], "rs": [0.0], "rc": 5.0,
                   "elements": [1, 6, 8]},
        g4_kwargs={"eta": [0.3], "lamda": [1.0], "rc": 5.0, "zeta": [1.0],
                   "elements": [1, 6, 8], "multiplicity": 2.0},
        mlp_charge_kwargs={"units": [8, 1], "num_relations": 9,
                           "activation": ["swish", "linear"]},
        mlp_local_kwargs={"units": [8, 1], "num_relations": 9,
                          "activation": ["swish", "linear"]})
    out = m.apply(m.init(jax.random.PRNGKey(0), b), b)
    q = np.asarray(out["charge"]) * np.asarray(b.node_mask)
    per_mol = np.zeros(b.n_graphs)
    np.add.at(per_mol, np.asarray(b.graph_id), q)
    target = np.asarray(b.globals["total_charge"]).reshape(-1)
    gm = np.asarray(b.globals["graph_mask"], bool).reshape(-1)
    np.testing.assert_allclose(per_mol[gm], target[gm], atol=1e-4)


def test_energy_force_trainer_step_reduces_loss():
    from gcnn_keras_tpu.models.schnet import make_model
    from gcnn_keras_tpu.model.force import EnergyForceModel
    from gcnn_keras_tpu.training.trainer import Trainer
    from gcnn_keras_tpu.training.losses import (masked_graph_mae,
                                                masked_node_mae)

    graphs = _mols()
    rs = np.random.RandomState(1)
    for g in graphs:
        g["force"] = (rs.randn(len(g["node_number"]), 3) * 0.1
                      ).astype(np.float32)
    b = batch_graphs(graphs, global_keys=("energy",))
    fmodel = EnergyForceModel(make_model(
        depth=1, interaction_args={"units": 16},
        gauss_args={"bins": 8, "distance_max": 5.0},
        last_mlp={"units": [8], "activation": ["shifted_softplus"]},
        output_mlp={"units": [1], "activation": ["linear"]}))
    params = fmodel.init(jax.random.PRNGKey(0), b)

    def loss_fn(p, bb):
        out = fmodel.apply(p, bb)
        le = masked_graph_mae(out["energy"], bb.globals["energy"],
                              bb.globals["graph_mask"])
        lf = masked_node_mae(out["force"], bb.nodes["force"], bb.node_mask)
        return le + 10.0 * lf, {}

    tr = Trainer(loss_fn, optax.adam(5e-3))
    state = tr.init_state(params)
    step = tr.step_fn()
    losses = []
    for _ in range(8):
        state, m = step(state, b)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]
    assert np.isfinite(losses).all()
