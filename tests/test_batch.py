import numpy as np
import jax.numpy as jnp

from gcnn_keras_tpu.batch import GraphBatch, batch_graphs, flat_to_padded, padded_to_flat


import pytest

pytestmark = pytest.mark.smoke


def tiny_graphs():
    g1 = {
        "node_number": np.array([1, 8, 1]),
        "node_coordinates": np.array([[0.0, 0, 0], [1, 0, 0], [0, 1, 0]]),
        "edge_indices": np.array([[0, 1], [1, 0], [1, 2], [2, 1]]),
        "graph_labels": np.array([1.5]),
    }
    g2 = {
        "node_number": np.array([6, 6]),
        "node_coordinates": np.array([[0.0, 0, 0], [1.4, 0, 0]]),
        "edge_indices": np.array([[0, 1], [1, 0]]),
        "graph_labels": np.array([-0.5]),
    }
    return [g1, g2]


def test_batch_shapes_and_disjoint_indices():
    b = batch_graphs(tiny_graphs(), n_node_pad=8, n_edge_pad=8, n_graph_pad=3)
    assert b.n_node == 8 and b.n_edge == 8 and b.n_graphs == 3
    assert b.node_mask.sum() == 5
    assert b.edge_mask.sum() == 6
    # second graph's nodes are offset by 3
    assert np.array_equal(np.asarray(b.graph_id)[:5], [0, 0, 0, 1, 1])
    # receivers are sorted
    recv = np.asarray(b.receivers)
    assert np.all(np.diff(recv) >= 0)
    # each real edge connects nodes of the same graph
    gid = np.asarray(b.graph_id)
    em = np.asarray(b.edge_mask)
    assert np.array_equal(gid[np.asarray(b.senders)[em]], gid[recv[em]])
    # padding edges point at the dead node
    assert np.all(recv[~em] == 7)


def test_batch_globals():
    b = batch_graphs(tiny_graphs(), n_graph_pad=4)
    gl = np.asarray(b.globals["graph_labels"])
    assert gl.shape[0] == 4
    assert gl[0, 0] == 1.5 and gl[1, 0] == -0.5
    assert np.array_equal(np.asarray(b.globals["graph_mask"]), [1, 1, 0, 0])
    assert np.array_equal(np.asarray(b.globals["num_nodes"])[:2], [3, 2])


def test_gather_matches_numpy():
    """Edge gather of node features == reference GatherNodes semantics
    (kgcnn test/test_gather.py:29-40 analog)."""
    b = batch_graphs(tiny_graphs(), n_node_pad=8, n_edge_pad=8, n_graph_pad=3)
    x = np.asarray(b.nodes["node_coordinates"])
    out = x[np.asarray(b.senders)]
    # hand-build expectation for graph 1 edges
    em = np.asarray(b.edge_mask)
    send = np.asarray(b.senders)[em]
    recv = np.asarray(b.receivers)[em]
    for s, r in zip(send, recv):
        assert np.allclose(out[list(np.asarray(b.senders)).index(s)], x[s])


def test_flat_padded_roundtrip():
    b = batch_graphs(tiny_graphs(), n_node_pad=8, n_edge_pad=8, n_graph_pad=3)
    x = jnp.asarray(np.random.RandomState(0).randn(8, 4).astype(np.float32))
    x = x * jnp.asarray(b.node_mask)[:, None]
    padded = flat_to_padded(x, b)
    assert padded.shape == (3, 3, 4)
    back = padded_to_flat(padded, b)
    assert np.allclose(np.asarray(back), np.asarray(x))
    # padded rows beyond each graph's node count are zero
    assert np.allclose(np.asarray(padded)[1, 2], 0)


def test_angles():
    g = {
        "node_number": np.array([1, 8, 1]),
        "node_coordinates": np.eye(3),
        "edge_indices": np.array([[0, 1], [1, 0], [1, 2], [2, 1]]),
        "angle_indices_nodes": np.array([[1, 0, 2], [1, 2, 0]]),
    }
    b = batch_graphs([g, g], n_node_pad=8, n_edge_pad=16, n_graph_pad=3, n_angle_pad=8)
    a = np.asarray(b.angles)
    am = np.asarray(b.angle_mask)
    assert am.sum() == 4
    assert np.array_equal(a[2], [4, 3, 5])  # second copy shifted by 3
