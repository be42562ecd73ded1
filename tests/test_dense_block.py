"""Dense-block execution mode (layers/dense_block.py): the per-molecule
padded (G, M, M) message-passing path must be numerically interchangeable
with the flat gather/scatter path — same parameter pytree, same energies,
same forces, same training gradients."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from gcnn_keras_tpu.batch import batch_graphs
from gcnn_keras_tpu.graph.preprocess import set_range
from gcnn_keras_tpu.models.schnet import make_model
from gcnn_keras_tpu.model.force import EnergyForceModel
from gcnn_keras_tpu.training.losses import masked_graph_mae, masked_node_mae


def _mol_batch(n_mols=6, seed=0, max_neighbours=25):
    rs = np.random.RandomState(seed)
    graphs = []
    for _ in range(n_mols):
        n = rs.randint(4, 13)
        g = {
            "node_number": rs.choice([1, 6, 7, 8], size=n),
            "node_coordinates": (rs.randn(n, 3) * 2.0).astype(np.float32),
            "energy": np.array([rs.randn()], dtype=np.float32),
        }
        g = set_range(g, max_distance=4.0, max_neighbours=max_neighbours)
        g["edge_indices"] = g.pop("range_indices")
        g["force"] = (rs.randn(n, 3) * 0.1).astype(np.float32)
        graphs.append(g)
    return batch_graphs(graphs, global_keys=("energy",))


def test_dense_block_param_tree_and_forward_parity():
    batch = _mol_batch()
    flat = EnergyForceModel(make_model())
    dense = EnergyForceModel(make_model(dense_block=True))
    params = flat.init(jax.random.PRNGKey(0), batch, train=False)
    p2 = dense.init(jax.random.PRNGKey(1), batch, train=False)
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(p2))
    o1 = flat.apply(params, batch, train=False)
    o2 = dense.apply(params, batch, train=False)
    np.testing.assert_allclose(o2["energy"], o1["energy"], atol=1e-5)
    np.testing.assert_allclose(o2["force"], o1["force"], atol=1e-5)


def test_dense_block_train_grad_parity():
    batch = _mol_batch(seed=3)

    def make_loss(fmodel):
        def loss_fn(params, b):
            out = fmodel.apply(params, b, train=False)
            e = masked_graph_mae(out["energy"], b.globals["energy"],
                                 b.globals["graph_mask"])
            f = masked_node_mae(out["force"], b.nodes["force"], b.node_mask)
            return e + 100.0 * f
        return loss_fn

    flat = EnergyForceModel(make_model())
    dense = EnergyForceModel(make_model(dense_block=True))
    params = flat.init(jax.random.PRNGKey(0), batch, train=False)
    l1, g1 = jax.value_and_grad(make_loss(flat))(params, batch)
    l2, g2 = jax.value_and_grad(make_loss(dense))(params, batch)
    assert abs(float(l1) - float(l2)) < 1e-5
    flat_g1 = jax.tree_util.tree_leaves(g1)
    flat_g2 = jax.tree_util.tree_leaves(g2)
    for a, b in zip(flat_g1, flat_g2):
        np.testing.assert_allclose(b, a, atol=2e-4, rtol=1e-3)


@pytest.mark.parametrize("pool,cfpool", [("mean", "mean"), ("mean", "sum")])
def test_dense_block_mean_pooling_parity(pool, cfpool):
    batch = _mol_batch(seed=5)
    kw = dict(node_pooling_args={"pooling_method": pool},
              interaction_args={"units": 32, "use_bias": True,
                               "activation": "shifted_softplus",
                               "cfconv_pool": cfpool},
              depth=2)
    flat = EnergyForceModel(make_model(**kw))
    dense = EnergyForceModel(make_model(dense_block=True, **kw))
    params = flat.init(jax.random.PRNGKey(0), batch, train=False)
    o1 = flat.apply(params, batch, train=False)
    o2 = dense.apply(params, batch, train=False)
    np.testing.assert_allclose(o2["energy"], o1["energy"], atol=1e-5)
    np.testing.assert_allclose(o2["force"], o1["force"], atol=1e-5)


def test_dense_block_node_output_parity():
    batch = _mol_batch(seed=7)
    kw = dict(output_embedding="node",
              output_mlp={"units": [32, 3], "activation": ["swish", "linear"]})
    m1, m2 = make_model(**kw), make_model(dense_block=True, **kw)
    params = m1.init(jax.random.PRNGKey(0), batch, train=False)
    o1 = m1.apply(params, batch, train=False)["output"]
    o2 = m2.apply(params, batch, train=False)["output"]
    # padding-node rows are meaningless (flat path propagates biases into
    # them, dense path zeroes them) — compare valid nodes only
    m = np.asarray(batch.node_mask)
    np.testing.assert_allclose(np.asarray(o2)[m], np.asarray(o1)[m], atol=1e-5)


def test_dense_block_padding_invariance():
    """Same molecules, different batch padding -> identical energies."""
    rs = np.random.RandomState(11)
    graphs = []
    for _ in range(4):
        n = rs.randint(4, 10)
        g = {"node_number": rs.choice([1, 6, 8], size=n),
             "node_coordinates": (rs.randn(n, 3) * 2.0).astype(np.float32),
             "energy": np.array([rs.randn()], dtype=np.float32)}
        g = set_range(g, max_distance=4.0, max_neighbours=20)
        g["edge_indices"] = g.pop("range_indices")
        graphs.append(g)
    b1 = batch_graphs(graphs, global_keys=("energy",))
    b2 = batch_graphs(graphs + graphs[:1], global_keys=("energy",))
    model = make_model(dense_block=True)
    params = model.init(jax.random.PRNGKey(0), b1, train=False)
    e1 = model.apply(params, b1, train=False)["output"]
    e2 = model.apply(params, b2, train=False)["output"]
    np.testing.assert_allclose(np.asarray(e2)[:4], np.asarray(e1)[:4], atol=1e-5)


def test_dense_block_rejects_periodic():
    import numpy as np
    from gcnn_keras_tpu.graph.preprocess import set_range_periodic
    g = {"node_number": np.array([11, 17]),
         "node_coordinates": np.array([[0.0, 0, 0], [2.82, 2.82, 2.82]],
                                      dtype=np.float32),
         "graph_lattice": (np.eye(3, dtype=np.float32) * 5.64),
         "energy": np.array([0.0], dtype=np.float32)}
    g = set_range_periodic(g, max_distance=4.0)
    g["edge_indices"] = g.pop("range_indices")
    batch = batch_graphs([g], global_keys=("energy",))
    model = make_model(dense_block=True)
    with pytest.raises(ValueError, match="periodic"):
        model.init(jax.random.PRNGKey(0), batch, train=False)
