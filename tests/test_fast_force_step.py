"""The reverse-over-forward force-loss gradient (fast_force_step) must match
the naive reverse-over-reverse ``jax.grad`` to machine precision — it is a
re-association of the chain rule, not an approximation."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gcnn_keras_tpu.batch import batch_graphs
from gcnn_keras_tpu.graph.preprocess import set_range
from gcnn_keras_tpu.model.force import EnergyForceModel
from gcnn_keras_tpu.models.schnet import make_model
from gcnn_keras_tpu.training.fast_force_step import (
    energy_force_value_and_grad, make_force_train_step)
from gcnn_keras_tpu.training.losses import (
    masked_graph_mae, masked_graph_mse, masked_node_mae, masked_node_mse)


def _batch(seed=0, n_mols=6):
    rs = np.random.RandomState(seed)
    graphs = []
    for _ in range(n_mols):
        n = rs.randint(5, 9)
        g = {"node_number": rs.choice([1, 6, 8], size=n),
             "node_coordinates": (rs.randn(n, 3) * 1.5).astype(np.float32),
             "energy": np.array([rs.randn()], dtype=np.float32)}
        g = set_range(g, max_distance=4.0, max_neighbours=12)
        g["edge_indices"] = g.pop("range_indices")
        g["force"] = (rs.randn(n, 3) * 0.1).astype(np.float32)
        graphs.append(g)
    return batch_graphs(graphs, global_keys=("energy",))


@pytest.fixture(scope="module")
def setup():
    model = make_model(depth=2, interaction_args={"units": 32},
                       gauss_args={"bins": 16, "distance_max": 4.0},
                       last_mlp={"units": [32, 16],
                                 "activation": ["shifted_softplus"] * 2},
                       output_mlp={"units": [16, 1],
                                   "activation": ["shifted_softplus",
                                                  "linear"]})
    batch = _batch()
    params = model.init(jax.random.PRNGKey(0), batch)
    return model, batch, params


@pytest.mark.parametrize("kind", ["mae", "mse"])
def test_grads_match_naive(setup, kind):
    model, batch, params = setup
    we, wf = 1.0, 37.0
    fmodel = EnergyForceModel(model)

    def naive_loss(p, b):
        out = fmodel.apply(p, b)
        e_loss = (masked_graph_mae if kind == "mae" else masked_graph_mse)(
            out["energy"], b.globals["energy"], b.globals["graph_mask"])
        f_loss = (masked_node_mae if kind == "mae" else masked_node_mse)(
            out["force"], b.nodes["force"], b.node_mask)
        return we * e_loss + wf * f_loss

    naive_l, naive_g = jax.value_and_grad(naive_loss)(params, batch)

    vag = energy_force_value_and_grad(
        model, energy_weight=we, force_weight=wf,
        energy_loss_kind=kind, force_loss_kind=kind)
    (fast_l, metrics), fast_g = vag(params, batch)

    assert np.allclose(float(naive_l), float(fast_l), rtol=1e-6)
    flat_n, _ = jax.flatten_util.ravel_pytree(naive_g)
    flat_f, _ = jax.flatten_util.ravel_pytree(fast_g)
    np.testing.assert_allclose(np.asarray(flat_f), np.asarray(flat_n),
                               rtol=2e-5, atol=1e-7)


def test_train_step_runs_and_descends(setup):
    model, batch, params = setup
    import optax
    optimizer = optax.adam(1e-3)
    step = make_force_train_step(model, optimizer, donate=False,
                                 energy_weight=1.0, force_weight=50.0)
    opt_state = optimizer.init(params)
    losses = []
    for _ in range(12):
        params, opt_state, loss, metrics = step(params, opt_state, batch)
        losses.append(float(loss))
    assert losses[-1] < losses[0]
    assert np.isfinite(losses).all()
    assert "force_loss" in metrics
