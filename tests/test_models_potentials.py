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


def test_mxmnet_energy_force():
    """MXMNet.EnergyForceModel (reference hyper_md17_revised.py MXMNet
    entry): forces from one reverse pass through BOTH edge sets, the two
    spherical-basis mixings, and the Bessel bases — checked against the
    numerical gradient of the total energy."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from gcnn_keras_tpu.model.force import EnergyForceModel
    from gcnn_keras_tpu.models.mxmnet import make_model
    from tests.test_model_zoo2 import make_mxmnet_batch

    b = make_mxmnet_batch(seed=3)
    model = make_model(
        depth=1,
        input_embedding={"node": {"input_dim": 95, "output_dim": 16}},
        global_mp_kwargs={"units": 16},
        local_mp_kwargs={"units": 16, "output_units": 1,
                         "output_kernel_initializer": "glorot_uniform"},
        bessel_basis_local={"num_radial": 4, "cutoff": 5.0},
        bessel_basis_global={"num_radial": 4, "cutoff": 6.0},
        spherical_basis_local={"num_spherical": 2, "num_radial": 2,
                               "cutoff": 5.0},
        mlp_rbf_kwargs={"units": 16, "activation": "swish"},
        mlp_sbf_kwargs={"units": 16, "activation": "swish"})
    params = model.init(jax.random.PRNGKey(0), b)
    fmodel = EnergyForceModel(model)
    out = fmodel.apply(params, b)
    force = np.asarray(out["force"])
    assert np.isfinite(force[np.asarray(b.node_mask)]).all()

    def total_energy(coords):
        bb = b.replace_nodes(node_coordinates=coords)
        e = model.apply(params, bb)["output"]
        return float(jnp.sum(e[:2]))

    coords = np.asarray(b.nodes["node_coordinates"]).copy()
    eps = 1e-3
    for (i, d) in [(0, 0), (1, 2), (4, 1)]:
        cp = coords.copy(); cp[i, d] += eps
        cm = coords.copy(); cm[i, d] -= eps
        num = (total_energy(jnp.asarray(cp))
               - total_energy(jnp.asarray(cm))) / (2 * eps)
        assert abs(-num - force[i, d]) < 5e-2 * max(1.0, abs(num)), (i, d)


def test_angle_model_gradients_finite_with_padding():
    """NaN-gradient regression: padding angle pairs reference zero edge
    vectors; d||v||/dv at v=0 is NaN and survives output masking in the
    backward pass. Both angle models must produce finite parameter AND
    coordinate gradients on padded batches."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from tests.test_model_zoo2 import make_mxmnet_batch
    from gcnn_keras_tpu.model.force import EnergyForceModel

    def check(model, batch):
        params = model.init(jax.random.PRNGKey(0), batch)

        def loss(p, coords):
            bb = batch.replace_nodes(node_coordinates=coords)
            out = EnergyForceModel(model).apply(p, bb)
            gm = batch.globals["graph_mask"].astype(jnp.float32)
            e = jnp.sum(jnp.abs(out["energy"][:, 0]) * gm)
            f = jnp.sum(jnp.abs(out["force"])
                        * batch.node_mask[:, None].astype(jnp.float32))
            return e + f

        g_p, g_c = jax.grad(loss, argnums=(0, 1))(
            params, batch.nodes["node_coordinates"])
        for leaf in jax.tree.leaves(g_p):
            assert np.isfinite(np.asarray(leaf)).all()
        assert np.isfinite(np.asarray(g_c)).all()

    b = make_mxmnet_batch(seed=5)
    from gcnn_keras_tpu.models.mxmnet import make_model as make_mxm
    check(make_mxm(
        depth=1, input_embedding={"node": {"input_dim": 95, "output_dim": 16}},
        global_mp_kwargs={"units": 16},
        local_mp_kwargs={"units": 16, "output_units": 1,
                         "output_kernel_initializer": "glorot_uniform"},
        bessel_basis_local={"num_radial": 4, "cutoff": 5.0},
        bessel_basis_global={"num_radial": 4, "cutoff": 6.0},
        spherical_basis_local={"num_spherical": 2, "num_radial": 2,
                               "cutoff": 5.0},
        mlp_rbf_kwargs={"units": 16, "activation": "swish"},
        mlp_sbf_kwargs={"units": 16, "activation": "swish"}), b)

    # DimeNetPP on the same geometry with a single angle-pair list
    import numpy as np
    from gcnn_keras_tpu.batch import batch_graphs
    from gcnn_keras_tpu.graph.preprocess import (set_range,
                                                 set_angle_pairs_kgcnn)
    rs = np.random.RandomState(2)
    graphs = []
    for _ in range(2):
        n = rs.randint(4, 6)
        g = {"node_number": rs.choice([1, 6, 8], size=n),
             "node_coordinates": (rs.randn(n, 3) * 1.5).astype(np.float32)}
        g = set_range(g, max_distance=4.0, max_neighbours=8)
        g["edge_indices"] = g.pop("range_indices")
        g = set_angle_pairs_kgcnn(g, range_indices="edge_indices",
                                  edge_pairing="kj",
                                  out_key="angle_indices")
        graphs.append(g)
    b2 = batch_graphs(graphs, angle_edge_index_key="angle_indices")
    from gcnn_keras_tpu.models.dimenet_pp import make_model as make_dime
    check(make_dime(num_blocks=1, emb_size=16, out_emb_size=16,
                    int_emb_size=8, basis_emb_size=4, num_spherical=2,
                    num_radial=3, output_init="glorot_uniform"), b2)
