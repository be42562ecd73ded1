import numpy as np
import jax
import jax.numpy as jnp

from gcnn_keras_tpu.batch import batch_graphs
from gcnn_keras_tpu.graph.preprocess import set_range, set_angle


def mol_graph(rs, n=5, elements=(1, 6, 16)):
    pos = rs.randn(n, 3).astype(np.float32) * 1.2
    g = {
        "node_number": rs.choice(elements, size=n),
        "node_coordinates": pos,
        "total_charge": np.array([0.0], dtype=np.float32),
        "esp": rs.randn(n).astype(np.float32) * 0.01,
        "esp_grad": rs.randn(n, 3).astype(np.float32) * 0.01,
    }
    g = set_range(g, max_distance=6.0, max_neighbours=10)
    g["edge_indices"] = g.pop("range_indices")
    g = set_angle(g, range_indices="edge_indices")
    return g


def make_batch(graphs, **kw):
    return batch_graphs(graphs, global_keys=("total_charge",), **kw)


def test_painn_rotation_invariance():
    from gcnn_keras_tpu.models.painn import make_model
    rs = np.random.RandomState(3)
    g = mol_graph(rs, n=5)
    model = make_model(depth=2, conv_args={"units": 32}, update_args={"units": 32},
                       input_embedding={"node": {"output_dim": 32}},
                       bessel_basis={"num_radial": 8, "cutoff": 5.0},
                       output_mlp={"units": [32, 1], "activation": ["swish", "linear"]})
    b = make_batch([g], n_node_pad=8, n_edge_pad=64)
    params = model.init(jax.random.PRNGKey(0), b)
    e1 = model.apply(params, b)["output"]

    # rotate coordinates
    theta = 0.7
    R = np.array([[np.cos(theta), -np.sin(theta), 0],
                  [np.sin(theta), np.cos(theta), 0], [0, 0, 1]], dtype=np.float32)
    g2 = dict(g, node_coordinates=g["node_coordinates"] @ R.T)
    b2 = make_batch([g2], n_node_pad=8, n_edge_pad=64)
    e2 = model.apply(params, b2)["output"]
    assert np.allclose(np.asarray(e1)[0], np.asarray(e2)[0], atol=1e-4)


def test_hdnnp2nd_forward_and_padding_invariance():
    from gcnn_keras_tpu.models.hdnnp2nd import make_model_behler
    rs = np.random.RandomState(5)
    graphs = [mol_graph(rs, n=4), mol_graph(rs, n=6)]
    model = make_model_behler(
        mlp_kwargs={"units": [16, 1], "num_relations": 17,
                    "activation": ["swish", "linear"]})
    b1 = make_batch(graphs, n_node_pad=16, n_edge_pad=128, n_angle_pad=256)
    params = model.init(jax.random.PRNGKey(0), b1, train=False)
    e1 = model.apply(params, b1, train=False)["output"]
    b2 = make_batch(graphs, n_node_pad=32, n_edge_pad=256, n_angle_pad=512,
                    n_graph_pad=5)
    e2 = model.apply(params, b2, train=False)["output"]
    assert np.allclose(np.asarray(e1)[:2], np.asarray(e2)[:2], atol=1e-4)


def test_hdnnp2nd_weighted_forward():
    from gcnn_keras_tpu.models.hdnnp2nd import make_model_weighted
    rs = np.random.RandomState(6)
    graphs = [mol_graph(rs, n=4)]
    model = make_model_weighted(
        mlp_kwargs={"units": [16, 1], "num_relations": 17,
                    "activation": ["swish", "linear"]})
    b = make_batch(graphs, n_node_pad=8, n_edge_pad=64, n_angle_pad=128)
    params = model.init(jax.random.PRNGKey(0), b, train=False)
    out = model.apply(params, b, train=False)["output"]
    assert out.shape[0] == 2  # graphs + padding graph
    assert np.isfinite(np.asarray(out)).all()


def test_cent_charge_conservation():
    """Solved charges must sum to the total charge per molecule
    (the Lagrange constraint of hdnnp_conv.py:219-244)."""
    from gcnn_keras_tpu.layers.conv.hdnnp_electro import CENTCharge
    rs = np.random.RandomState(7)
    g1 = mol_graph(rs, n=4)
    g2 = mol_graph(rs, n=6)
    g1["total_charge"] = np.array([1.0], dtype=np.float32)
    g2["total_charge"] = np.array([-1.0], dtype=np.float32)
    b = make_batch([g1, g2], n_node_pad=16, n_edge_pad=128, n_angle_pad=256)
    layer = CENTCharge()
    chi = jnp.asarray(rs.randn(16).astype(np.float32))
    q = layer.apply({}, b, chi)
    q = np.asarray(q)
    gid = np.asarray(b.graph_id)
    nm = np.asarray(b.node_mask)
    assert abs(q[nm & (gid == 0)].sum() - 1.0) < 1e-3
    assert abs(q[nm & (gid == 1)].sum() + 1.0) < 1e-3
    # padding charges are zero
    assert np.allclose(q[~nm], 0.0, atol=1e-5)


def test_hdnnp4th_forward_outputs():
    from gcnn_keras_tpu.models.hdnnp4th import make_model_behler
    rs = np.random.RandomState(8)
    graphs = [mol_graph(rs, n=4), mol_graph(rs, n=5)]
    model = make_model_behler(
        mlp_charge_kwargs={"units": [16, 1], "num_relations": 17,
                           "activation": ["swish", "linear"]},
        mlp_local_kwargs={"units": [16, 1], "num_relations": 17,
                          "activation": ["swish", "linear"]})
    b = make_batch(graphs, n_node_pad=16, n_edge_pad=128, n_angle_pad=256)
    params = model.init(jax.random.PRNGKey(0), b, train=False)
    out = model.apply(params, b, train=False)
    assert out["output"].shape == (3, 1)
    assert out["charge"].shape == (16,)
    q = np.asarray(out["charge"])
    gid = np.asarray(b.graph_id)
    nm = np.asarray(b.node_mask)
    assert abs(q[nm & (gid == 0)].sum() - 0.0) < 1e-3
    assert np.isfinite(np.asarray(out["output"])[:2]).all()


def test_hdnnp4th_energy_force_with_esp_coupling():
    from gcnn_keras_tpu.models.hdnnp4th import make_model_behler
    from gcnn_keras_tpu.model.force import EnergyForceModel
    rs = np.random.RandomState(9)
    graphs = [mol_graph(rs, n=4)]
    model = make_model_behler(
        mlp_charge_kwargs={"units": [8, 1], "num_relations": 17,
                           "activation": ["swish", "linear"]},
        mlp_local_kwargs={"units": [8, 1], "num_relations": 17,
                          "activation": ["swish", "linear"]})
    b = make_batch(graphs, n_node_pad=8, n_edge_pad=64, n_angle_pad=128)
    params = model.init(jax.random.PRNGKey(0), b, train=False)
    fmodel = EnergyForceModel(model, use_esp_coupling=True)
    out = fmodel.apply(params, b, train=False)
    assert out["force"].shape == (8, 3)
    assert np.isfinite(np.asarray(out["force"])).all()
    assert "charge" in out
