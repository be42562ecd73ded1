"""Smoke tests for the second wave of the model zoo."""
import numpy as np
import jax
import jax.numpy as jnp

from tests.test_model_zoo import make_mol_batch, _run


def test_zoo_cmpnn():
    from gcnn_keras_tpu.models.cmpnn import make_model
    _run(make_model(depth=2, node_initialize={"units": 16, "activation": "relu"},
                    edge_initialize={"units": 16, "activation": "relu"},
                    edge_dense={"units": 16, "activation": "linear"},
                    node_dense={"units": 16, "activation": "linear"},
                    pooling_gru={"units": 16},
                    output_mlp={"units": [16, 1], "activation": ["relu", "linear"]}),
         make_mol_batch(with_edge_attr=True))


def test_zoo_mxmnet():
    from gcnn_keras_tpu.models.mxmnet import make_model
    _run(make_model(depth=2, units=16,
                    bessel_basis_local={"num_radial": 8, "cutoff": 5.0},
                    mlp_rbf_kwargs={"units": 16, "activation": "swish"}),
         make_mol_batch(with_edge_attr=True))


def test_zoo_hamnet():
    from gcnn_keras_tpu.models.hamnet import make_model
    _run(make_model(depth=2,
                    message_kwargs={"units": 16, "units_edge": 16},
                    fingerprint_kwargs={"units": 16, "units_attend": 16, "depth": 2},
                    gru_kwargs={"units": 16},
                    output_mlp={"units": [8, 1], "activation": ["selu", "linear"]}),
         make_mol_batch(with_edge_attr=True))


def test_zoo_mat():
    from gcnn_keras_tpu.models.mat import make_model
    _run(make_model(depth=2, embedding_units=16,
                    attention_kwargs={"units": 16, "lambda_attention": 0.3,
                                      "lambda_distance": 0.3, "num_heads": 2},
                    feed_forward_kwargs={"units": [16, 16],
                                         "activation": ["relu", "linear"]},
                    output_mlp={"units": [8, 1], "activation": ["relu", "linear"]}),
         make_mol_batch())


def test_zoo_unet():
    from gcnn_keras_tpu.models.unet import make_model
    _run(make_model(depth=2, hidden_dim={"units": 16, "use_bias": True,
                                         "activation": "linear"},
                    output_mlp={"units": [8, 1], "activation": ["relu", "linear"]}),
         make_mol_batch(with_edge_attr=True))


def test_zoo_megan_with_explanations():
    from gcnn_keras_tpu.models.megan import make_model
    b = make_mol_batch(with_edge_attr=True)
    out = _run(make_model(units=[16, 16], importance_channels=2,
                          final_units=[8, 1]), b)
    assert out["node_importances"].shape == (b.n_node, 2)
    assert out["edge_importances"].shape == (b.n_edge, 2)


def test_gnn_explainer_on_gcn():
    from gcnn_keras_tpu.models.schnet import make_model
    from gcnn_keras_tpu.xai.gnn_explainer import GNNExplainer
    b = make_mol_batch()
    model = make_model(depth=1, interaction_args={"units": 8},
                       gauss_args={"bins": 8, "distance_max": 5.0},
                       last_mlp={"units": [8], "activation": ["shifted_softplus"]},
                       output_mlp={"units": [1], "activation": ["linear"]})
    params = model.init(jax.random.PRNGKey(0), b)

    def apply_fn(variables, batch):
        return model.apply(variables, batch)

    explainer = GNNExplainer(epochs=10, node_feature_key="node_number")
    node_imp, edge_imp = explainer(apply_fn, params, b)
    assert node_imp.shape == (b.n_node,)
    assert edge_imp.shape == (b.n_edge,)
    assert np.isfinite(np.asarray(node_imp)).all()
