import numpy as np
import jax
import jax.numpy as jnp

from gcnn_keras_tpu.batch import batch_graphs
from gcnn_keras_tpu.model.force import EnergyForceModel


def mol_graphs(seed=0, n_mols=3):
    rs = np.random.RandomState(seed)
    out = []
    for i in range(n_mols):
        n = rs.randint(3, 7)
        pos = rs.randn(n, 3) * 1.5
        # fully connected edges within cutoff
        ei = []
        for a in range(n):
            for b in range(n):
                if a != b and np.linalg.norm(pos[a] - pos[b]) < 4.0:
                    ei.append([a, b])
        out.append({
            "node_number": rs.randint(1, 9, size=n),
            "node_coordinates": pos.astype(np.float32),
            "edge_indices": np.array(ei, dtype=np.int64),
            "graph_labels": np.array([rs.randn()]),
        })
    return out


def make_batch(graphs, n_node_pad=32, n_edge_pad=128, n_graph_pad=None):
    return batch_graphs(graphs, n_node_pad=n_node_pad, n_edge_pad=n_edge_pad,
                        n_graph_pad=n_graph_pad or len(graphs) + 1)


def test_schnet_forward_and_padding_invariance():
    from gcnn_keras_tpu.models.schnet import make_model
    graphs = mol_graphs()
    model = make_model(depth=2, interaction_args={"units": 32},
                       last_mlp={"units": [32, 16],
                                 "activation": ["shifted_softplus", "shifted_softplus"]},
                       output_mlp={"units": [16, 1],
                                   "activation": ["shifted_softplus", "linear"]})
    b1 = make_batch(graphs, 32, 128)
    params = model.init(jax.random.PRNGKey(0), b1)
    e1 = model.apply(params, b1)["output"]
    # different padding must give identical energies for real graphs
    b2 = make_batch(graphs, 64, 256, n_graph_pad=6)
    e2 = model.apply(params, b2)["output"]
    assert np.allclose(np.asarray(e1)[:3], np.asarray(e2)[:3], atol=1e-5)


def test_schnet_forces_match_numeric_gradient():
    from gcnn_keras_tpu.models.schnet import make_model
    graphs = mol_graphs(seed=1, n_mols=2)
    model = make_model(depth=1, interaction_args={"units": 16},
                       gauss_args={"bins": 8, "distance_max": 5.0},
                       last_mlp={"units": [16], "activation": ["shifted_softplus"]},
                       output_mlp={"units": [1], "activation": ["linear"]})
    b = make_batch(graphs, 16, 64)
    params = model.init(jax.random.PRNGKey(0), b)
    fmodel = EnergyForceModel(model)
    out = fmodel.apply(params, b)
    assert out["force"].shape == (16, 3)

    # numerical check on a few coordinates
    def total_energy(coords):
        bb = b.replace_nodes(node_coordinates=coords)
        e = model.apply(params, bb)["output"]
        gm = np.asarray(b.globals["graph_mask"])
        return float(jnp.sum(e[:len(graphs)]))

    coords = np.asarray(b.nodes["node_coordinates"]).copy()
    eps = 1e-3
    for (i, d) in [(0, 0), (2, 1), (5, 2)]:
        cp = coords.copy(); cp[i, d] += eps
        cm = coords.copy(); cm[i, d] -= eps
        num = (total_energy(jnp.asarray(cp)) - total_energy(jnp.asarray(cm))) / (2 * eps)
        assert abs(-num - float(out["force"][i, d])) < 5e-2 * max(1.0, abs(num)), (i, d)


def test_gcn_forward_node_classification():
    from gcnn_keras_tpu.models.gcn import make_model
    rs = np.random.RandomState(0)
    n = 20
    ei = np.stack([rs.randint(0, n, 60), rs.randint(0, n, 60)], axis=1)
    g = {
        "node_attributes": rs.randn(n, 8).astype(np.float32),
        "edge_indices": ei,
        "edge_weights": np.ones((60, 1), dtype=np.float32),
    }
    b = batch_graphs([g], n_node_pad=32, n_edge_pad=64, n_graph_pad=2)
    model = make_model(depth=2, gcn_args={"units": 16},
                       output_embedding="node",
                       output_mlp={"units": [16, 7], "activation": ["relu", "linear"]})
    params = model.init(jax.random.PRNGKey(0), b)
    out = model.apply(params, b)["output"]
    assert out.shape == (32, 7)
