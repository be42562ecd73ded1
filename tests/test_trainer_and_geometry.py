import numpy as np
import jax
import jax.numpy as jnp
import optax

from gcnn_keras_tpu.batch import batch_graphs
from gcnn_keras_tpu.training.trainer import Trainer
from gcnn_keras_tpu.training.losses import masked_graph_mae


def test_trainer_fit_epoch():
    from gcnn_keras_tpu.models.gcn import make_model
    rs = np.random.RandomState(0)
    graphs = []
    for _ in range(8):
        n = rs.randint(4, 8)
        ei = np.stack([rs.randint(0, n, 12), rs.randint(0, n, 12)], axis=1)
        graphs.append({
            "node_attributes": rs.randn(n, 4).astype(np.float32),
            "edge_indices": ei,
            "edge_weights": np.ones((12, 1), dtype=np.float32),
            "graph_labels": np.array([rs.randn()], dtype=np.float32),
        })
    batches = [batch_graphs(graphs[i:i + 4], n_node_pad=64, n_edge_pad=64,
                            n_graph_pad=5) for i in (0, 4)]
    model = make_model(depth=1, gcn_args={"units": 8},
                       output_mlp={"units": [4, 1], "activation": ["relu", "linear"]})
    params = model.init(jax.random.PRNGKey(0), batches[0])

    def loss_fn(p, b):
        out = model.apply(p, b)["output"]
        return masked_graph_mae(out, b.globals["graph_labels"],
                                b.globals["graph_mask"]), {"mae": 0.0}

    trainer = Trainer(loss_fn, optax.adam(1e-2))
    state = trainer.init_state(params)
    losses = []
    for _ in range(5):
        state, metrics = trainer.fit_epoch(state, batches)
        losses.append(metrics["loss"])
    assert losses[-1] < losses[0]
    assert int(state.step) == 10


def test_frac_real_roundtrip():
    from gcnn_keras_tpu.layers.geometry import (
        frac_to_real_coordinates, real_to_frac_coordinates,
    )
    rs = np.random.RandomState(1)
    n = 5
    lattice = (np.eye(3) * 4 + rs.randn(3, 3) * 0.2).astype(np.float32)
    frac = rs.rand(n, 3).astype(np.float32)
    g = {"node_number": rs.randint(1, 9, n),
         "node_coordinates": frac,
         "graph_lattice": lattice,
         "edge_indices": np.array([[0, 1], [1, 0]])}
    b = batch_graphs([g])
    cart = frac_to_real_coordinates(b)
    back = real_to_frac_coordinates(b, cart)
    nm = np.asarray(b.node_mask)
    assert np.allclose(np.asarray(back)[nm], frac, atol=1e-5)
    # manual check: cart = frac @ lattice
    assert np.allclose(np.asarray(cart)[nm], frac @ lattice, atol=1e-5)
