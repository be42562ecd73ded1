"""Periodic/crystal graph correctness: lattice-image edges, supercell
consistency, crystal model forward."""
import numpy as np
import jax
import jax.numpy as jnp

from gcnn_keras_tpu.batch import batch_graphs
from gcnn_keras_tpu.graph.preprocess import set_range_periodic, set_range
from gcnn_keras_tpu.layers.geometry import edge_vectors


def simple_cubic(a=3.0, z=26):
    return {"node_number": np.array([z], dtype=np.int64),
            "node_coordinates": np.zeros((1, 3), dtype=np.float32),
            "graph_lattice": (np.eye(3) * a).astype(np.float32)}


def test_periodic_neighbor_list_counts():
    g = set_range_periodic(simple_cubic(a=3.0), max_distance=3.5)
    # simple cubic: 6 first neighbors at distance a=3.0
    d = g["range_attributes"].reshape(-1)
    assert (np.abs(d - 3.0) < 1e-5).sum() == 6
    assert g["range_indices"].shape[0] == g["range_image"].shape[0]


def test_periodic_edge_vectors_match_preprocessing():
    g = set_range_periodic(simple_cubic(a=3.0), max_distance=3.5)
    g["edge_indices"] = g["range_indices"]
    b = batch_graphs([g])
    vec = np.asarray(edge_vectors(b))
    em = np.asarray(b.edge_mask)
    d_model = np.linalg.norm(vec[em], axis=1)
    d_pre = g["range_attributes"].reshape(-1)
    assert np.allclose(np.sort(d_model), np.sort(d_pre), atol=1e-4)


def test_supercell_invariance():
    """Energy per atom of a 1-atom cell == of the 2x1x1 supercell."""
    from gcnn_keras_tpu.models.schnet import make_crystal_model
    model = make_crystal_model(depth=1, interaction_args={"units": 16},
                               gauss_args={"bins": 8, "distance_max": 4.0},
                               last_mlp={"units": [8],
                                         "activation": ["shifted_softplus"]},
                               output_mlp={"units": [1], "activation": ["linear"]})
    a = 3.0
    g1 = set_range_periodic(simple_cubic(a), max_distance=3.5)
    g1["edge_indices"] = g1["range_indices"]
    g2_base = {"node_number": np.array([26, 26], dtype=np.int64),
               "node_coordinates": np.array([[0, 0, 0], [a, 0, 0]],
                                            dtype=np.float32),
               "graph_lattice": np.diag([2 * a, a, a]).astype(np.float32)}
    g2 = set_range_periodic(g2_base, max_distance=3.5)
    g2["edge_indices"] = g2["range_indices"]

    b1 = batch_graphs([g1], n_node_pad=8, n_edge_pad=64)
    b2 = batch_graphs([g2], n_node_pad=8, n_edge_pad=64)
    params = model.init(jax.random.PRNGKey(0), b1)
    e1 = float(np.asarray(model.apply(params, b1)["output"])[0, 0])
    e2 = float(np.asarray(model.apply(params, b2)["output"])[0, 0])
    assert abs(e2 - 2 * e1) < 1e-3, (e1, e2)


def test_cgcnn_crystal_forward():
    from gcnn_keras_tpu.models.cgcnn import make_crystal_model
    g = set_range_periodic(
        {"node_number": np.array([3, 8], dtype=np.int64),
         "node_coordinates": np.array([[0, 0, 0], [1.5, 1.5, 1.5]],
                                      dtype=np.float32),
         "graph_lattice": (np.eye(3) * 3.0).astype(np.float32)},
        max_distance=3.2)
    g["edge_indices"] = g["range_indices"]
    b = batch_graphs([g])
    model = make_crystal_model(depth=1, conv_layer_args={"units": 16},
                               gauss_args={"bins": 8, "distance_max": 3.2})
    params = model.init(jax.random.PRNGKey(0), b, train=False)
    out = model.apply(params, b, train=False)["output"]
    assert np.isfinite(np.asarray(out)[0]).all()
