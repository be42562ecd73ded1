"""Forward-pass smoke test over the whole model zoo: every builder must
init + apply on a small batch and produce finite outputs of the right
leading shape."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gcnn_keras_tpu.batch import batch_graphs
from gcnn_keras_tpu.graph.preprocess import set_range, set_angle


def make_mol_batch(with_angles=False, with_edge_attr=False, seed=0):
    rs = np.random.RandomState(seed)
    graphs = []
    for _ in range(2):
        n = rs.randint(4, 7)
        g = {
            "node_number": rs.choice([1, 6, 8], size=n),
            "node_coordinates": (rs.randn(n, 3) * 1.5).astype(np.float32),
            "graph_labels": np.array([rs.randn()], dtype=np.float32),
        }
        g = set_range(g, max_distance=6.0, max_neighbours=8)
        g["edge_indices"] = g.pop("range_indices")
        if with_angles:
            g = set_angle(g, range_indices="edge_indices")
        if with_edge_attr:
            m = g["edge_indices"].shape[0]
            g["edge_attributes"] = rs.randn(m, 8).astype(np.float32)
            g["edge_relations"] = rs.randint(0, 3, size=m)
            g["edge_weights"] = np.ones((m, 1), dtype=np.float32)
        graphs.append(g)
    return batch_graphs(graphs, n_node_pad=16, n_edge_pad=128,
                        n_angle_pad=256 if with_angles else None,
                        compute_reverse_edges=True)


SMALL = {"units": 16}


def _run(model, batch, **apply_kw):
    params = model.init(jax.random.PRNGKey(0), batch, train=False)
    out = model.apply(params, batch, train=False, **apply_kw)
    assert "output" in out
    val = np.asarray(out["output"])
    assert np.isfinite(val[np.asarray(batch.globals["graph_mask"])
                           if val.shape[0] == batch.n_graphs else slice(None)]).all()
    return out


def test_zoo_gin():
    from gcnn_keras_tpu.models.gin import make_model
    _run(make_model(depth=2, gin_mlp={"units": [16, 16], "activation": ["relu", "linear"]},
                    last_mlp={"units": [16], "activation": ["relu"]}),
         make_mol_batch())


def test_zoo_gat_and_v2():
    from gcnn_keras_tpu.models.gat import make_model, make_model_v2
    b = make_mol_batch(with_edge_attr=True)
    _run(make_model(depth=1, attention_heads_num=2, attention_args={"units": 16}), b)
    _run(make_model_v2(depth=1, attention_heads_num=2, attention_args={"units": 16}), b)


def test_zoo_sage():
    from gcnn_keras_tpu.models.sage import make_model
    _run(make_model(depth=2,
                    node_mlp_args={"units": [16, 8], "activation": ["relu", "linear"]},
                    edge_mlp_args={"units": 16, "activation": "relu"}),
         make_mol_batch(with_edge_attr=True))


def test_zoo_dmpnn():
    from gcnn_keras_tpu.models.dmpnn import make_model
    _run(make_model(depth=2, edge_initialize={"units": 16, "activation": "relu"},
                    edge_dense={"units": 16, "activation": "linear"},
                    node_dense={"units": 16, "activation": "relu"}),
         make_mol_batch(with_edge_attr=True))


def test_zoo_megnet():
    from gcnn_keras_tpu.models.megnet import make_model
    _run(make_model(nblocks=1,
                    meg_block_args={"node_embed": [16, 8], "edge_embed": [16, 8],
                                    "env_embed": [16, 8], "activation": "softplus2"},
                    set2set_args={"channels": 8, "T": 2},
                    node_ff_args={"units": [16, 8], "activation": "softplus2"},
                    edge_ff_args={"units": [16, 8], "activation": "softplus2"},
                    state_ff_args={"units": [16, 8], "activation": "softplus2"}),
         make_mol_batch())


def test_zoo_nmpn():
    from gcnn_keras_tpu.models.nmpn import make_model
    _run(make_model(depth=2, node_dim=8,
                    edge_mlp={"units": [16, 16], "activation": ["swish", "linear"]},
                    set2set_args={"channels": 8, "T": 2},
                    make_distance=True, expand_distance=True,
                    gauss_args={"bins": 8, "distance_max": 5.0}),
         make_mol_batch())


def test_zoo_attentivefp():
    from gcnn_keras_tpu.models.attentivefp import make_model
    _run(make_model(depthato=2, depthmol=2, attention_args={"units": 16},
                    output_mlp={"units": [16, 1], "activation": ["leaky_relu", "linear"]}),
         make_mol_batch(with_edge_attr=True))


def test_zoo_inorp():
    from gcnn_keras_tpu.models.inorp import make_model
    _run(make_model(depth=2,
                    node_mlp_args={"units": [16, 8], "activation": ["relu", "linear"]},
                    edge_mlp_args={"units": [16, 8], "activation": "relu"}),
         make_mol_batch(with_edge_attr=True))


def test_zoo_rgcn():
    from gcnn_keras_tpu.models.rgcn import make_model
    _run(make_model(depth=2, dense_relation_kwargs={"units": 16, "num_relations": 4}),
         make_mol_batch(with_edge_attr=True))


def test_zoo_gnnfilm():
    from gcnn_keras_tpu.models.gnnfilm import make_model
    _run(make_model(depth=2,
                    dense_relation_kwargs={"units": 16, "num_relations": 4},
                    dense_modulation_kwargs={"units": 16, "num_relations": 4}),
         make_mol_batch(with_edge_attr=True))


def test_zoo_egnn():
    from gcnn_keras_tpu.models.egnn import make_model
    _run(make_model(depth=2,
                    # embedding width must equal node_mlp output width for
                    # the residual skip (same constraint as the reference)
                    input_embedding={"node": {"input_dim": 95, "output_dim": 16},
                                     "edge": {"input_dim": 95, "output_dim": 16}},
                    edge_mlp_kwargs={"units": [16, 16], "activation": ["swish", "linear"]},
                    coord_mlp_kwargs={"units": [16, 1], "activation": ["swish", "linear"]},
                    node_mlp_kwargs={"units": [16, 16], "activation": ["swish", "linear"]}),
         make_mol_batch())


def test_zoo_cgcnn():
    from gcnn_keras_tpu.models.cgcnn import make_crystal_model
    _run(make_crystal_model(depth=2, conv_layer_args={"units": 16},
                            gauss_args={"bins": 16, "distance_max": 6.0}),
         make_mol_batch())


def test_registry_resolves_all():
    from gcnn_keras_tpu.models.registry import get_model_class
    for name in ["GCN", "Schnet", "PAiNN", "HDNNP2nd", "HDNNP4th", "GIN",
                 "GAT", "GraphSAGE", "DMPNN", "Megnet", "NMPN", "AttentiveFP",
                 "INorp", "RGCN", "GNNFilm", "EGNN", "CGCNN"]:
        fn = get_model_class(name)
        assert callable(fn), name
