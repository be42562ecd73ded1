"""Full-model golden parity against the reference implementation.

Fixtures in ``tests/assets/ref_golden_*.npz`` were recorded by
``tools/record_reference_goldens.py`` running the actual reference kgcnn
(TF CPU) on fixed molecules: inputs, every layer weight (in
``model.weights`` order), and the model output. Here we copy those weights
into this framework's models and require the outputs to match — the
end-to-end cross-implementation check SURVEY.md §6 calls for.
"""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gcnn_keras_tpu.batch import batch_graphs

ASSETS = os.path.join(os.path.dirname(__file__), "assets")


def _load(name):
    path = os.path.join(ASSETS, f"ref_golden_{name}.npz")
    if not os.path.exists(path):
        pytest.skip(f"{path} not recorded")
    d = np.load(path)
    n = int(d["n_graphs"])
    graphs = []
    for i in range(n):
        g = {k[len(f"g{i}_"):]: d[k] for k in d.files
             if k.startswith(f"g{i}_")}
        graphs.append(g)
    weights = [d[k] for k in sorted(d.files)
               if k.startswith("w") and not k.startswith("wname")]
    out = d["out0"]
    return graphs, weights, out


def _set(params, path, value):
    """Assign into a nested param dict by '/'-separated path."""
    node = params["params"]
    keys = path.split("/")
    for k in keys[:-1]:
        node = node[k]
    assert node[keys[-1]].shape == value.shape, \
        f"{path}: {node[keys[-1]].shape} vs {value.shape}"
    node[keys[-1]] = jnp.asarray(value)


def _apply_mapping(params, weights, mapping):
    params = jax.tree.map(lambda x: x, params)  # deep copy
    assert len(mapping) == len(weights), (len(mapping), len(weights))
    for path, w in zip(mapping, weights):
        if path is None:
            continue
        _set(params, path, w)
    return params


# --- Shared reference-weight mappings (reference ``model.weights`` order ->
# this framework's param paths). Used by both the forward-parity tests here
# and the force-path parity tests in test_force_parity.py.

def schnet_mapping(depth=2):
    mapping = ["OptionalInputEmbedding_0/Embed_0/embedding",
               "embed_to_units/Dense_0/kernel", "embed_to_units/Dense_0/bias"]
    for i in range(depth):
        p = f"interaction_{i}"
        mapping += [f"{p}/cfconv/filter_1/Dense_0/kernel",
                    f"{p}/cfconv/filter_1/Dense_0/bias",
                    f"{p}/cfconv/filter_2/Dense_0/kernel",
                    f"{p}/cfconv/filter_2/Dense_0/bias",
                    f"{p}/pre/Dense_0/kernel",
                    f"{p}/post_1/Dense_0/kernel", f"{p}/post_1/Dense_0/bias",
                    f"{p}/post_2/Dense_0/kernel", f"{p}/post_2/Dense_0/bias"]
    for blk, k in (("last_mlp", 2), ("output_mlp", 2)):
        for i in range(k):
            mapping += [f"{blk}/dense_{i}/Dense_0/kernel",
                        f"{blk}/dense_{i}/Dense_0/bias"]
    return mapping


def painn_mapping(depth=2):
    # Second slot is the reference's trainable Bessel frequency vector at
    # init (n*pi) — ours uses the same closed form; callers assert instead.
    mapping = ["OptionalInputEmbedding_0/Embed_0/embedding", None]
    for i in range(depth):
        mapping += [f"conv_{i}/dense_1/Dense_0/kernel",
                    f"conv_{i}/dense_1/Dense_0/bias",
                    f"conv_{i}/phi/Dense_0/kernel",
                    f"conv_{i}/phi/Dense_0/bias",
                    f"conv_{i}/w/Dense_0/kernel",
                    f"conv_{i}/w/Dense_0/bias",
                    f"update_{i}/dense_1/Dense_0/kernel",
                    f"update_{i}/dense_1/Dense_0/bias",
                    f"update_{i}/lin_u/Dense_0/kernel",
                    f"update_{i}/lin_v/Dense_0/kernel",
                    f"update_{i}/a/Dense_0/kernel",
                    f"update_{i}/a/Dense_0/bias"]
    mapping += ["output_mlp/dense_0/Dense_0/kernel",
                "output_mlp/dense_0/Dense_0/bias",
                "output_mlp/dense_1/Dense_0/kernel",
                "output_mlp/dense_1/Dense_0/bias"]
    return mapping


def hdnnp2nd_mapping():
    """Returns (mapping, broadcast_indices): the reference shares the
    RelationalMLP bias across relations; ours is per-relation, so the weights
    at ``broadcast_indices`` must be broadcast to (num_relations, ...)."""
    mapping = [None, None, None, None, None,
               "atomic_mlp/rel_dense_0/kernel", "atomic_mlp/rel_dense_0/bias",
               "atomic_mlp/rel_dense_1/kernel", "atomic_mlp/rel_dense_1/bias",
               "atomic_mlp/rel_dense_2/kernel", "atomic_mlp/rel_dense_2/bias"]
    return mapping, (6, 8, 10)


def hdnnp4th_mapping():
    mapping = [None, None, None, None, None,
               "mlp_charge/rel_dense_0/kernel", "mlp_charge/rel_dense_0/bias",
               "mlp_charge/rel_dense_1/kernel", "mlp_charge/rel_dense_1/bias",
               "mlp_charge/rel_dense_2/kernel", "mlp_charge/rel_dense_2/bias",
               None, None,
               "mlp_local/rel_dense_0/kernel", "mlp_local/rel_dense_0/bias",
               "mlp_local/rel_dense_1/kernel", "mlp_local/rel_dense_1/bias",
               "mlp_local/rel_dense_2/kernel", "mlp_local/rel_dense_2/bias"]
    return mapping, (6, 8, 10, 14, 16, 18)


def broadcast_relational(weights, indices, num_relations=9):
    weights = list(weights)
    for i in indices:
        weights[i] = np.broadcast_to(
            weights[i], (num_relations,) + weights[i].shape).copy()
    return weights


def test_schnet_matches_reference():
    graphs, weights, ref_out = _load("schnet")
    for g in graphs:
        g["node_number"] = g.pop("z").astype(np.int64)
        g["node_coordinates"] = g["xyz"]
    batch = batch_graphs(graphs)

    from gcnn_keras_tpu.models.schnet import make_model
    model = make_model(depth=2)
    params = model.init(jax.random.PRNGKey(0), batch)

    params = _apply_mapping(params, weights, schnet_mapping(depth=2))
    out = model.apply(params, batch)["output"]
    out = np.asarray(out)[:len(graphs)]  # drop the padding graph slot
    np.testing.assert_allclose(out, ref_out, rtol=1e-4, atol=2e-5)


def test_painn_matches_reference():
    graphs, weights, ref_out = _load("painn")
    for g in graphs:
        g["node_number"] = g.pop("z").astype(np.int64)
        g["node_coordinates"] = g["xyz"]
    batch = batch_graphs(graphs)

    from gcnn_keras_tpu.models.painn import make_model
    model = make_model(depth=2)
    params = model.init(jax.random.PRNGKey(0), batch)

    # w001 is the reference's trainable Bessel frequency vector at init
    # (n*pi); our basis uses the same closed form, so assert instead of map.
    freq = weights[1]
    np.testing.assert_allclose(freq, np.arange(1, 21) * np.pi, rtol=1e-6)

    params = _apply_mapping(params, weights, painn_mapping(depth=2))
    out = model.apply(params, batch)["output"]
    out = np.asarray(out)[:len(graphs)]  # drop the padding graph slot
    np.testing.assert_allclose(out, ref_out, rtol=1e-4, atol=2e-5)


def test_gcn_matches_reference():
    graphs, weights, ref_out = _load("gcn")
    for g in graphs:
        g.pop("z"); g.pop("xyz")
    batch = batch_graphs(graphs)

    from gcnn_keras_tpu.models.gcn import make_model
    model = make_model(
        depth=3,
        gcn_args={"units": 100, "activation": "relu", "pooling_method": "sum"},
        output_mlp={"units": [25, 10, 1],
                    "activation": ["relu", "relu", "sigmoid"],
                    "use_bias": [True, True, False]})
    params = model.init(jax.random.PRNGKey(0), batch)

    mapping = ["embed_to_units/Dense_0/kernel", "embed_to_units/Dense_0/bias"]
    for i in range(3):
        mapping += [f"gcn_{i}/Dense_0/Dense_0/kernel",
                    f"gcn_{i}/Dense_0/Dense_0/bias"]
    mapping += ["output/output_mlp/dense_0/Dense_0/kernel",
                "output/output_mlp/dense_0/Dense_0/bias",
                "output/output_mlp/dense_1/Dense_0/kernel",
                "output/output_mlp/dense_1/Dense_0/bias",
                "output/output_mlp/dense_2/Dense_0/kernel"]
    params = _apply_mapping(params, weights, mapping)
    out = model.apply(params, batch)["output"]
    out = np.asarray(out)[:len(graphs)]  # drop the padding graph slot
    np.testing.assert_allclose(out, ref_out, rtol=1e-4, atol=2e-5)


def test_gin_matches_reference():
    graphs, weights, ref_out = _load("gin")
    for g in graphs:
        g.pop("z"); g.pop("xyz"); g.pop("edge_attributes", None)
    batch = batch_graphs(graphs)

    from gcnn_keras_tpu.models.gin import make_model
    model = make_model(depth=2,
                       output_mlp={"units": [1], "activation": ["linear"]})
    params = model.init(jax.random.PRNGKey(0), batch)

    mapping = ["embed_to_units/Dense_0/kernel", "embed_to_units/Dense_0/bias"]
    for i in range(2):
        np.testing.assert_allclose(weights[2 + 13 * i], 0.0)  # epsilon_k
        mapping += [None,  # epsilon_k (non-learnable, zero)
                    f"gin_mlp_{i}/dense_0/Dense_0/kernel",
                    f"gin_mlp_{i}/dense_0/Dense_0/bias",
                    f"gin_mlp_{i}/dense_1/Dense_0/kernel",
                    f"gin_mlp_{i}/dense_1/Dense_0/bias",
                    f"gin_mlp_{i}/norm_0/scale", f"gin_mlp_{i}/norm_0/bias",
                    f"gin_mlp_{i}/norm_1/scale", f"gin_mlp_{i}/norm_1/bias",
                    None, None, None, None]  # moving stats (0/1 at init both)
    for i in range(3):
        for j in range(3):
            mapping += [f"out_mlp_{i}/dense_{j}/Dense_0/kernel",
                        f"out_mlp_{i}/dense_{j}/Dense_0/bias"]
    mapping += ["final/dense_0/Dense_0/kernel", "final/dense_0/Dense_0/bias"]
    params = _apply_mapping(params, weights, mapping)
    out = model.apply(params, batch)["output"]
    out = np.asarray(out)[:len(graphs)]
    np.testing.assert_allclose(out, ref_out, rtol=1e-4, atol=2e-5)


def test_gatv2_matches_reference():
    graphs, weights, ref_out = _load("gatv2")
    for g in graphs:
        g.pop("z"); g.pop("xyz")
    batch = batch_graphs(graphs)

    from gcnn_keras_tpu.models.gatv2 import make_model
    model = make_model(
        depth=1, attention_heads_num=2, attention_heads_concat=False,
        attention_args={"units": 32, "use_edge_features": True,
                        "use_bias": True, "activation": "relu",
                        "use_final_activation": False},
        output_mlp={"units": [32, 1], "activation": ["relu", "linear"]})
    params = model.init(jax.random.PRNGKey(0), batch)

    mapping = ["embed_to_units/Dense_0/kernel", "embed_to_units/Dense_0/bias"]
    for k in range(2):
        mapping += [f"head_0_{k}/linear_trafo/Dense_0/kernel",
                    f"head_0_{k}/linear_trafo/Dense_0/bias",
                    f"head_0_{k}/alpha_activation/Dense_0/kernel",
                    f"head_0_{k}/alpha_activation/Dense_0/bias",
                    f"head_0_{k}/alpha/Dense_0/kernel"]
    mapping += ["out_mlp/dense_0/Dense_0/kernel", "out_mlp/dense_0/Dense_0/bias",
                "out_mlp/dense_1/Dense_0/kernel", "out_mlp/dense_1/Dense_0/bias"]
    params = _apply_mapping(params, weights, mapping)
    out = model.apply(params, batch)["output"]
    out = np.asarray(out)[:len(graphs)]
    np.testing.assert_allclose(out, ref_out, rtol=1e-4, atol=2e-5)


def test_graphsage_matches_reference():
    graphs, weights, ref_out = _load("graphsage")
    for g in graphs:
        g.pop("z"); g.pop("xyz")
    batch = batch_graphs(graphs)

    from gcnn_keras_tpu.models.sage import make_model
    model = make_model(
        depth=2, use_edge_features=True,
        node_mlp_args={"units": [100, 50], "activation": ["relu", "linear"]},
        edge_mlp_args={"units": [100, 50], "activation": ["relu", "linear"]},
        pooling_args={"pooling_method": "mean"},
        pooling_nodes_args={"pooling_method": "mean"},
        output_mlp={"units": [25, 10, 1],
                    "activation": ["relu", "relu", "sigmoid"],
                    "use_bias": [True, True, False]})
    params = model.init(jax.random.PRNGKey(0), batch)

    mapping = []
    for i in range(2):
        mapping += [f"edge_mlp_{i}/dense_0/Dense_0/kernel",
                    f"edge_mlp_{i}/dense_0/Dense_0/bias",
                    f"edge_mlp_{i}/dense_1/Dense_0/kernel",
                    f"edge_mlp_{i}/dense_1/Dense_0/bias",
                    f"node_mlp_{i}/dense_0/Dense_0/kernel",
                    f"node_mlp_{i}/dense_0/Dense_0/bias",
                    f"node_mlp_{i}/dense_1/Dense_0/kernel",
                    f"node_mlp_{i}/dense_1/Dense_0/bias",
                    f"norm_{i}/LayerNorm_0/scale", f"norm_{i}/LayerNorm_0/bias"]
    mapping += ["out_mlp/dense_0/Dense_0/kernel", "out_mlp/dense_0/Dense_0/bias",
                "out_mlp/dense_1/Dense_0/kernel", "out_mlp/dense_1/Dense_0/bias",
                "out_mlp/dense_2/Dense_0/kernel"]
    params = _apply_mapping(params, weights, mapping)
    out = model.apply(params, batch)["output"]
    out = np.asarray(out)[:len(graphs)]
    np.testing.assert_allclose(out, ref_out, rtol=1e-4, atol=2e-5)


def test_dmpnn_matches_reference():
    graphs, weights, ref_out = _load("dmpnn")
    for g in graphs:
        g.pop("z"); g.pop("xyz"); g.pop("edge_indices_reverse", None)
    batch = batch_graphs(graphs, compute_reverse_edges=True)

    from gcnn_keras_tpu.models.dmpnn import make_model
    model = make_model(
        depth=2,
        output_mlp={"units": [64, 32, 1],
                    "activation": ["relu", "relu", "linear"],
                    "use_bias": [True, True, False]})
    params = model.init(jax.random.PRNGKey(0), batch)

    mapping = ["edge_init/Dense_0/kernel", "edge_init/Dense_0/bias",
               "edge_dense_shared/Dense_0/kernel",
               "edge_dense_shared/Dense_0/bias",
               "node_dense/Dense_0/kernel", "node_dense/Dense_0/bias",
               "out_mlp/dense_0/Dense_0/kernel", "out_mlp/dense_0/Dense_0/bias",
               "out_mlp/dense_1/Dense_0/kernel", "out_mlp/dense_1/Dense_0/bias",
               "out_mlp/dense_2/Dense_0/kernel"]
    params = _apply_mapping(params, weights, mapping)
    out = model.apply(params, batch)["output"]
    out = np.asarray(out)[:len(graphs)]
    np.testing.assert_allclose(out, ref_out, rtol=1e-4, atol=2e-5)


def test_hdnnp2nd_matches_reference():
    graphs, weights, ref_out = _load("hdnnp2nd")
    for g in graphs:
        g["node_number"] = g.pop("z").astype(np.int64)
        g["node_coordinates"] = g["xyz"]
    batch = batch_graphs(graphs)

    from gcnn_keras_tpu.models.hdnnp2nd import make_model_behler
    model = make_model_behler(
        g2_kwargs={"eta": [0.0, 0.3], "rs": [0.0, 3.0], "rc": 10.0,
                   "elements": [1, 6, 8]},
        g4_kwargs={"eta": [0.0, 0.3], "lamda": [-1.0, 1.0], "rc": 6.0,
                   "zeta": [1.0, 8.0], "elements": [1, 6, 8],
                   "multiplicity": 2.0},
        normalize_kwargs={},
        mlp_kwargs={"units": [32, 32, 1], "num_relations": 9,
                    "activation": ["swish", "swish", "linear"]})
    params = model.init(jax.random.PRNGKey(0), batch)

    # w0-w4 are the ACSF parameter tables / element lookup constants —
    # rebuilt from the same config on our side; the output match certifies
    # them.
    mapping, bcast = hdnnp2nd_mapping()
    params = _apply_mapping(params, broadcast_relational(weights, bcast),
                            mapping)
    out = model.apply(params, batch)["output"]
    out = np.asarray(out)[:len(graphs)]
    np.testing.assert_allclose(out, ref_out, rtol=1e-4, atol=5e-5)


def test_hdnnp4th_matches_reference():
    graphs, weights, ref_out_charge = _load("hdnnp4th")
    d = np.load(os.path.join(ASSETS, "ref_golden_hdnnp4th.npz"))
    ref_out_energy = d["out1"]
    for g in graphs:
        g["node_number"] = g.pop("z").astype(np.int64)
        g["node_coordinates"] = g["xyz"]
    batch = batch_graphs(graphs, global_keys=("total_charge",))

    from gcnn_keras_tpu.models.hdnnp4th import make_model_behler
    model = make_model_behler(
        g2_kwargs={"eta": [0.0, 0.3], "rs": [0.0, 3.0], "rc": 10.0,
                   "elements": [1, 6, 8]},
        g4_kwargs={"eta": [0.0, 0.3], "lamda": [-1.0, 1.0], "rc": 6.0,
                   "zeta": [1.0, 8.0], "elements": [1, 6, 8],
                   "multiplicity": 2.0},
        normalize_kwargs={},
        mlp_charge_kwargs={"units": [32, 32, 1], "num_relations": 9,
                           "activation": ["swish", "swish", "linear"]},
        mlp_local_kwargs={"units": [32, 32, 1], "num_relations": 9,
                          "activation": ["swish", "swish", "linear"]})
    params = model.init(jax.random.PRNGKey(0), batch)

    # w0-4: ACSF tables (constants, certified via output); w11/w12: the
    # reference's physical hardness/sigma element tables (use_physical_params,
    # non-trainable) — ours are built from the same published constants, so
    # the output match certifies them too.
    mapping, bcast = hdnnp4th_mapping()
    params = _apply_mapping(params, broadcast_relational(weights, bcast),
                            mapping)
    out = model.apply(params, batch)

    # energy parity
    energy = np.asarray(out["output"])[:len(graphs)]
    np.testing.assert_allclose(energy, ref_out_energy, rtol=1e-4, atol=5e-5)
    # charge parity (reference output padded (G, N_max, 1))
    q = np.asarray(out["charge"])
    nm = np.asarray(batch.node_mask)
    gid = np.asarray(batch.graph_id)
    for i, g in enumerate(graphs):
        ours = q[nm & (gid == i)]
        ref = ref_out_charge[i, :len(g["node_number"]), 0]
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=5e-5)


def test_cmpnn_matches_reference():
    graphs, weights, ref_out = _load("cmpnn")
    for g in graphs:
        g.pop("z"); g.pop("xyz"); g.pop("edge_indices_reverse", None)
    batch = batch_graphs(graphs, compute_reverse_edges=True)

    from gcnn_keras_tpu.models.cmpnn import make_model
    model = make_model(depth=2)
    params = model.init(jax.random.PRNGKey(0), batch)

    mapping = ["node_init/Dense_0/kernel", "node_init/Dense_0/bias",
               "edge_init/Dense_0/kernel", "edge_init/Dense_0/bias",
               "edge_dense_0/Dense_0/kernel", "edge_dense_0/Dense_0/bias",
               "node_out/Dense_0/kernel", "node_out/Dense_0/bias",
               "gru_final/kernel", "gru_final/recurrent_kernel",
               "gru_final/bias",
               "out_mlp/dense_0/Dense_0/kernel", "out_mlp/dense_0/Dense_0/bias",
               "out_mlp/dense_1/Dense_0/kernel", "out_mlp/dense_1/Dense_0/bias",
               "out_mlp/dense_2/Dense_0/kernel"]
    params = _apply_mapping(params, weights, mapping)
    out = model.apply(params, batch)["output"]
    out = np.asarray(out)[:len(graphs)]
    np.testing.assert_allclose(out, ref_out, rtol=1e-4, atol=2e-5)


def test_inorp_matches_reference():
    graphs, weights, ref_out = _load("inorp")
    for g in graphs:
        g.pop("z"); g.pop("xyz")
    batch = batch_graphs(graphs, global_keys=("graph_attributes",))

    from gcnn_keras_tpu.models.inorp import make_model
    model = make_model(
        depth=2, use_set2set=False,
        node_mlp_args={"units": [100, 50], "activation": ["relu", "linear"]},
        edge_mlp_args={"units": [100, 100, 100, 100, 50],
                       "activation": ["relu", "relu", "relu", "relu",
                                      "linear"]},
        pooling_args={"pooling_method": "mean"},
        output_mlp={"units": [25, 10, 1],
                    "activation": ["relu", "relu", "sigmoid"],
                    "use_bias": [True, True, False]})
    params = model.init(jax.random.PRNGKey(0), batch)

    mapping = []
    for i in range(2):
        for j in range(5):
            mapping += [f"edge_mlp_{i}/dense_{j}/Dense_0/kernel",
                        f"edge_mlp_{i}/dense_{j}/Dense_0/bias"]
        for j in range(2):
            mapping += [f"node_mlp_{i}/dense_{j}/Dense_0/kernel",
                        f"node_mlp_{i}/dense_{j}/Dense_0/bias"]
    mapping += ["out_mlp/dense_0/Dense_0/kernel", "out_mlp/dense_0/Dense_0/bias",
                "out_mlp/dense_1/Dense_0/kernel", "out_mlp/dense_1/Dense_0/bias",
                "out_mlp/dense_2/Dense_0/kernel"]
    params = _apply_mapping(params, weights, mapping)
    out = model.apply(params, batch)["output"]
    out = np.asarray(out)[:len(graphs)]
    np.testing.assert_allclose(out, ref_out, rtol=1e-4, atol=2e-5)


def test_rgcn_matches_reference():
    graphs, weights, ref_out = _load("rgcn")
    for g in graphs:
        g.pop("z"); g.pop("xyz")
    batch = batch_graphs(graphs)

    from gcnn_keras_tpu.models.rgcn import make_model
    model = make_model(
        depth=2, dense_relation_kwargs={"units": 64, "num_relations": 5},
        output_mlp={"units": [32, 1], "activation": ["relu", "linear"]})
    params = model.init(jax.random.PRNGKey(0), batch)

    weights = list(weights)
    for i in (1, 5):  # shared relational bias -> per-relation broadcast
        weights[i] = np.broadcast_to(weights[i], (5,) + weights[i].shape).copy()
    mapping = []
    for i in range(2):
        mapping += [f"rgcn_{i}/rel_dense/kernel", f"rgcn_{i}/rel_dense/bias",
                    f"rgcn_{i}/self_dense/Dense_0/kernel",
                    f"rgcn_{i}/self_dense/Dense_0/bias"]
    mapping += ["out_mlp/dense_0/Dense_0/kernel", "out_mlp/dense_0/Dense_0/bias",
                "out_mlp/dense_1/Dense_0/kernel", "out_mlp/dense_1/Dense_0/bias"]
    params = _apply_mapping(params, weights, mapping)
    out = model.apply(params, batch)["output"]
    out = np.asarray(out)[:len(graphs)]
    np.testing.assert_allclose(out, ref_out, rtol=1e-4, atol=2e-5)


def test_gnnfilm_matches_reference():
    graphs, weights, ref_out = _load("gnnfilm")
    for g in graphs:
        g.pop("z"); g.pop("xyz")
    batch = batch_graphs(graphs)

    from gcnn_keras_tpu.models.gnnfilm import make_model
    model = make_model(
        depth=2,
        dense_relation_kwargs={"units": 64, "num_relations": 5},
        dense_modulation_kwargs={"units": 64, "num_relations": 5},
        output_mlp={"units": [32, 1], "activation": ["relu", "linear"]})
    params = model.init(jax.random.PRNGKey(0), batch)

    weights = list(weights)
    for i in (1, 3, 5, 7, 9, 11):  # shared relational biases -> broadcast
        weights[i] = np.broadcast_to(weights[i], (5,) + weights[i].shape).copy()
    # recorded order per depth: h_j (w_rel), gamma, beta
    mapping = []
    for i in range(2):
        mapping += [f"w_rel_{i}/kernel", f"w_rel_{i}/bias",
                    f"gamma_{i}/kernel", f"gamma_{i}/bias",
                    f"beta_{i}/kernel", f"beta_{i}/bias"]
    mapping += ["out_mlp/dense_0/Dense_0/kernel", "out_mlp/dense_0/Dense_0/bias",
                "out_mlp/dense_1/Dense_0/kernel", "out_mlp/dense_1/Dense_0/bias"]
    params = _apply_mapping(params, weights, mapping)
    out = model.apply(params, batch)["output"]
    out = np.asarray(out)[:len(graphs)]
    np.testing.assert_allclose(out, ref_out, rtol=1e-4, atol=2e-5)


def test_nmpn_matches_reference():
    graphs, weights, ref_out = _load("nmpn")
    for g in graphs:
        g["node_number"] = g.pop("z").astype(np.int64)
        g["node_coordinates"] = g["xyz"]
    batch = batch_graphs(graphs)

    from gcnn_keras_tpu.models.nmpn import make_model
    model = make_model(depth=2, make_distance=True, expand_distance=True,
                       output_mlp={"units": [25, 10, 1],
                                   "activation": ["selu", "selu", "sigmoid"],
                                   "use_bias": [True, True, False]})
    params = model.init(jax.random.PRNGKey(0), batch)

    mapping = ["OptionalInputEmbedding_0/Embed_0/embedding",
               "node_proj/Dense_0/kernel", "node_proj/Dense_0/bias"]
    for blk in ("edge_net_in", "edge_net_out"):
        for j in range(3):
            mapping += [f"{blk}/dense_{j}/Dense_0/kernel",
                        f"{blk}/dense_{j}/Dense_0/bias"]
    mapping += ["edge_net_in_out/Dense_0/kernel", "edge_net_in_out/Dense_0/bias",
                "edge_net_out_out/Dense_0/kernel",
                "edge_net_out_out/Dense_0/bias",
                "gru/kernel", "gru/recurrent_kernel", "gru/bias",
                "set2set_proj/Dense_0/kernel", "set2set_proj/Dense_0/bias",
                "set2set/kernel", "set2set/recurrent_kernel", "set2set/bias",
                "out_mlp/dense_0/Dense_0/kernel", "out_mlp/dense_0/Dense_0/bias",
                "out_mlp/dense_1/Dense_0/kernel", "out_mlp/dense_1/Dense_0/bias",
                "out_mlp/dense_2/Dense_0/kernel"]
    params = _apply_mapping(params, weights, mapping)
    out = model.apply(params, batch)["output"]
    out = np.asarray(out)[:len(graphs)]
    np.testing.assert_allclose(out, ref_out, rtol=1e-4, atol=2e-5)


def test_megnet_matches_reference():
    graphs, weights, ref_out = _load("megnet")
    for g in graphs:
        g["node_number"] = g.pop("z").astype(np.int64)
        g["node_coordinates"] = g["xyz"]
    batch = batch_graphs(graphs, global_keys=("graph_attributes",))

    from gcnn_keras_tpu.models.megnet import make_model
    model = make_model(nblocks=1)
    params = model.init(jax.random.PRNGKey(0), batch)

    mapping = ["OptionalInputEmbedding_0/Embed_0/embedding"]
    for blk in ("node_ff_0", "edge_ff_0", "state_ff_0"):
        for j in range(2):
            mapping += [f"{blk}/dense_{j}/Dense_0/kernel",
                        f"{blk}/dense_{j}/Dense_0/bias"]
    for phi in ("node_mlp", "edge_mlp", "env_mlp"):
        for j in range(3):
            mapping += [f"block_0/{phi}/dense_{j}/Dense_0/kernel",
                        f"block_0/{phi}/dense_{j}/Dense_0/bias"]
    mapping += ["set2set_proj_nodes/Dense_0/kernel",
                "set2set_proj_nodes/Dense_0/bias",
                "set2set_proj_edges/Dense_0/kernel",
                "set2set_proj_edges/Dense_0/bias",
                "set2set_nodes/kernel", "set2set_nodes/recurrent_kernel",
                "set2set_nodes/bias",
                "set2set_edges/kernel", "set2set_edges/recurrent_kernel",
                "set2set_edges/bias"]
    for j in range(3):
        mapping += [f"out_mlp/dense_{j}/Dense_0/kernel",
                    f"out_mlp/dense_{j}/Dense_0/bias"]
    params = _apply_mapping(params, weights, mapping)
    out = model.apply(params, batch)["output"]
    out = np.asarray(out)[:len(graphs)]
    np.testing.assert_allclose(out, ref_out, rtol=1e-4, atol=2e-5)


def test_cgcnn_crystal_matches_reference():
    """Periodic CGCNN — also certifies the periodic edge-vector convention
    (image shifts the sender, d = x_i - (x_j + s L))."""
    graphs, weights, ref_out = _load("cgcnn")
    prepared = []
    for g in graphs:
        frac, lat = g["frac"], g["lattice"]
        prepared.append({
            "node_number": g["z"].astype(np.int64),
            "node_coordinates": (frac @ lat).astype(np.float32),
            "edge_indices": g["edge_indices"],
            "range_image": g["cell_translations"].astype(np.int64),
            "graph_lattice": lat.astype(np.float32)})
    batch = batch_graphs(prepared, global_keys=("graph_lattice",))

    from gcnn_keras_tpu.models.cgcnn import make_crystal_model
    model = make_crystal_model(
        depth=1, gauss_args={"bins": 40, "distance_max": 8.0},
        conv_layer_args={"units": 64, "activation_s": "softplus",
                         "activation_out": "softplus",
                         "batch_normalization": True},
        node_pooling_args={"pooling_method": "mean"},
        output_mlp={"units": [64, 1], "activation": ["softplus", "linear"],
                    "use_bias": [True, False]})
    params = model.init(jax.random.PRNGKey(0), batch)

    mapping = ["OptionalInputEmbedding_0/Embed_0/embedding",
               "proj/Dense_0/kernel", "proj/Dense_0/bias",
               "conv_0/bn_f/scale", "conv_0/bn_f/bias",
               "conv_0/bn_s/scale", "conv_0/bn_s/bias",
               "conv_0/bn_out/scale", "conv_0/bn_out/bias",
               "conv_0/w_f/Dense_0/kernel", "conv_0/w_f/Dense_0/bias",
               "conv_0/w_s/Dense_0/kernel", "conv_0/w_s/Dense_0/bias",
               None, None, None, None, None, None,  # moving stats (0/1 init)
               "out_mlp/dense_0/Dense_0/kernel", "out_mlp/dense_0/Dense_0/bias",
               "out_mlp/dense_1/Dense_0/kernel"]
    params = _apply_mapping(params, weights, mapping)
    out = model.apply(params, batch)["output"]
    out = np.asarray(out)[:len(graphs)]
    np.testing.assert_allclose(out, ref_out, rtol=1e-4, atol=2e-5)


def test_egnn_matches_reference():
    graphs, weights, ref_out = _load("egnn")
    for g in graphs:
        g["node_number"] = g.pop("z").astype(np.int64)
        g["node_coordinates"] = g["xyz"]
    batch = batch_graphs(graphs)

    from gcnn_keras_tpu.models.egnn import make_model
    model = make_model(depth=2)
    params = model.init(jax.random.PRNGKey(0), batch)

    # the last depth's coord MLP is pruned from the reference model graph
    # (x is never used after the final update), so it has no weights there;
    # ours keeps init values (it cannot affect the output either).
    mapping = ["OptionalInputEmbedding_0/Embed_0/embedding"]
    for blk in ("edge_mlp_0", "coord_mlp_0", "node_mlp_0",
                "edge_mlp_1", "node_mlp_1", "out_mlp"):
        for j in range(2):
            mapping += [f"{blk}/dense_{j}/Dense_0/kernel",
                        f"{blk}/dense_{j}/Dense_0/bias"]
    params = _apply_mapping(params, weights, mapping)
    out = model.apply(params, batch)["output"]
    out = np.asarray(out)[:len(graphs)]
    np.testing.assert_allclose(out, ref_out, rtol=1e-4, atol=2e-5)


def test_dimenetpp_matches_reference():
    graphs, weights, ref_out = _load("dimenetpp")
    for g in graphs:
        g["node_number"] = g.pop("z").astype(np.int64)
        g["node_coordinates"] = g["xyz"]
    batch = batch_graphs(graphs, angle_edge_index_key="angle_indices")

    from gcnn_keras_tpu.models.dimenet_pp import make_model
    model = make_model(
        num_blocks=1, emb_size=32, out_emb_size=32, int_emb_size=16,
        basis_emb_size=4, num_spherical=4, num_radial=5, num_targets=8,
        output_init="glorot_uniform",
        input_embedding={"node": {"input_dim": 96, "output_dim": 32}},
        output_mlp={"units": [16, 1], "activation": ["swish", "linear"],
                    "use_bias": [True, False]})
    params = model.init(jax.random.PRNGKey(0), batch)

    # w001 = trainable Bessel frequencies at init (n*pi); ours closed-form
    np.testing.assert_allclose(weights[1], np.arange(1, 6) * np.pi, rtol=1e-6)

    mapping = ["embed_z/embedding", None,
               "embed_rbf/Dense_0/kernel", "embed_rbf/Dense_0/bias",
               "embed_out/Dense_0/kernel", "embed_out/Dense_0/bias",
               "interaction_0/rbf_1/Dense_0/kernel",
               "interaction_0/rbf_2/Dense_0/kernel",
               "interaction_0/sbf_1/Dense_0/kernel",
               "interaction_0/sbf_2/Dense_0/kernel",
               "interaction_0/ji/Dense_0/kernel",
               "interaction_0/ji/Dense_0/bias",
               "interaction_0/kj/Dense_0/kernel",
               "interaction_0/kj/Dense_0/bias",
               "interaction_0/down/Dense_0/kernel",
               "interaction_0/up/Dense_0/kernel",
               "interaction_0/res_before_0/dense_1/Dense_0/kernel",
               "interaction_0/res_before_0/dense_1/Dense_0/bias",
               "interaction_0/res_before_0/dense_2/Dense_0/kernel",
               "interaction_0/res_before_0/dense_2/Dense_0/bias",
               "interaction_0/skip/Dense_0/kernel",
               "interaction_0/skip/Dense_0/bias",
               "interaction_0/res_after_0/dense_1/Dense_0/kernel",
               "interaction_0/res_after_0/dense_1/Dense_0/bias",
               "interaction_0/res_after_0/dense_2/Dense_0/kernel",
               "interaction_0/res_after_0/dense_2/Dense_0/bias",
               "interaction_0/res_after_1/dense_1/Dense_0/kernel",
               "interaction_0/res_after_1/dense_1/Dense_0/bias",
               "interaction_0/res_after_1/dense_2/Dense_0/kernel",
               "interaction_0/res_after_1/dense_2/Dense_0/bias"]
    for ob in ("output_0", "output_1"):
        mapping += [f"{ob}/rbf/Dense_0/kernel", f"{ob}/up/Dense_0/kernel"]
        for j in range(3):
            mapping += [f"{ob}/dense_{j}/Dense_0/kernel",
                        f"{ob}/dense_{j}/Dense_0/bias"]
        mapping += [f"{ob}/out/Dense_0/kernel"]
    mapping += ["output_mlp/dense_0/Dense_0/kernel",
                "output_mlp/dense_0/Dense_0/bias",
                "output_mlp/dense_1/Dense_0/kernel"]
    params = _apply_mapping(params, weights, mapping)
    out = model.apply(params, batch)["output"]
    out = np.asarray(out)[:len(graphs)]
    np.testing.assert_allclose(out, ref_out, rtol=2e-4, atol=1e-4)


def test_schnet_crystal_matches_reference():
    """Periodic SchNet — certifies ShiftPeriodicLattice-equivalent edge
    vectors through the full crystal model."""
    graphs, weights, ref_out = _load("schnet_crystal")
    prepared = []
    for g in graphs:
        prepared.append({
            "node_number": g["z"].astype(np.int64),
            "node_coordinates": g["xyz"],
            "edge_indices": g["edge_indices"],
            "range_image": g["edge_image"].astype(np.int64),
            "graph_lattice": g["lattice"].astype(np.float32)})
    batch = batch_graphs(prepared, global_keys=("graph_lattice",))

    from gcnn_keras_tpu.models.schnet import make_crystal_model
    model = make_crystal_model(depth=2)
    params = model.init(jax.random.PRNGKey(0), batch)

    params = _apply_mapping(params, weights, schnet_mapping(depth=2))
    out = model.apply(params, batch)["output"]
    out = np.asarray(out)[:len(graphs)]
    np.testing.assert_allclose(out, ref_out, rtol=1e-4, atol=2e-5)


def test_gat_matches_reference():
    graphs, weights, ref_out = _load("gat")
    for g in graphs:
        g.pop("z"); g.pop("xyz")
    batch = batch_graphs(graphs)

    from gcnn_keras_tpu.models.gat import make_model
    model = make_model(
        depth=1, attention_heads_num=2, attention_heads_concat=False,
        attention_args={"units": 32, "use_edge_features": True,
                        "use_bias": True, "activation": "relu",
                        "use_final_activation": False},
        output_mlp={"units": [32, 1], "activation": ["relu", "linear"]})
    params = model.init(jax.random.PRNGKey(0), batch)

    mapping = ["embed_to_units/Dense_0/kernel", "embed_to_units/Dense_0/bias"]
    for k in range(2):
        mapping += [f"head_0_{k}/linear_trafo/Dense_0/kernel",
                    f"head_0_{k}/linear_trafo/Dense_0/bias",
                    f"head_0_{k}/alpha/Dense_0/kernel"]
    mapping += ["out_mlp/dense_0/Dense_0/kernel", "out_mlp/dense_0/Dense_0/bias",
                "out_mlp/dense_1/Dense_0/kernel", "out_mlp/dense_1/Dense_0/bias"]
    params = _apply_mapping(params, weights, mapping)
    out = model.apply(params, batch)["output"]
    out = np.asarray(out)[:len(graphs)]
    np.testing.assert_allclose(out, ref_out, rtol=1e-4, atol=2e-5)


def test_attentivefp_matches_reference():
    graphs, weights, ref_out = _load("attentivefp")
    for g in graphs:
        g.pop("z"); g.pop("xyz")
    batch = batch_graphs(graphs)

    from gcnn_keras_tpu.models.attentivefp import make_model
    model = make_model(depthato=2, depthmol=2, attention_args={"units": 32},
                       output_mlp={"units": [16, 1],
                                   "activation": ["kgcnn>leaky_relu",
                                                  "linear"]})
    params = model.init(jax.random.PRNGKey(0), batch)

    # reference weight order: node-in Dense; head_0 creates linear_trafo,
    # alpha_activation, alpha, then fc1, fc2 (attentivefp_conv.py:60-71);
    # GRU cells are keras-layout (kernel, recurrent_kernel, bias(2,3U))
    mapping = ["node_in/Dense_0/kernel", "node_in/Dense_0/bias",
               "head_0/linear_trafo/Dense_0/kernel",
               "head_0/linear_trafo/Dense_0/bias",
               "head_0/alpha_activation/Dense_0/kernel",
               "head_0/alpha_activation/Dense_0/bias",
               "head_0/alpha/Dense_0/kernel",
               "head_0/fc1/Dense_0/kernel", "head_0/fc1/Dense_0/bias",
               "head_0/fc2/Dense_0/kernel", "head_0/fc2/Dense_0/bias",
               "gru_0/kernel", "gru_0/recurrent_kernel", "gru_0/bias",
               "head_1/linear_trafo/Dense_0/kernel",
               "head_1/linear_trafo/Dense_0/bias",
               "head_1/alpha_activation/Dense_0/kernel",
               "head_1/alpha_activation/Dense_0/bias",
               "head_1/alpha/Dense_0/kernel",
               "gru_1/kernel", "gru_1/recurrent_kernel", "gru_1/bias",
               "pool_attentive/linear_trafo/Dense_0/kernel",
               "pool_attentive/linear_trafo/Dense_0/bias",
               "pool_attentive/alpha/Dense_0/kernel",
               "pool_attentive/alpha/Dense_0/bias",
               "pool_attentive/gru/kernel",
               "pool_attentive/gru/recurrent_kernel",
               "pool_attentive/gru/bias",
               "out_mlp/dense_0/Dense_0/kernel", "out_mlp/dense_0/Dense_0/bias",
               "out_mlp/dense_1/Dense_0/kernel", "out_mlp/dense_1/Dense_0/bias"]
    params = _apply_mapping(params, weights, mapping)
    out = model.apply(params, batch)["output"]
    out = np.asarray(out)[:len(graphs)]
    np.testing.assert_allclose(out, ref_out, rtol=1e-4, atol=2e-5)


def test_hamnet_matches_reference():
    graphs, weights, ref_out = _load("hamnet")
    for g in graphs:
        g.pop("z")
        g["node_coordinates"] = g.pop("xyz")
    batch = batch_graphs(graphs)

    from gcnn_keras_tpu.models.hamnet import make_model
    model = make_model(depth=2,
                       message_kwargs={"units": 32, "units_edge": 32},
                       fingerprint_kwargs={"units": 32, "units_attend": 32,
                                           "depth": 2},
                       gru_kwargs={"units": 32})
    params = model.init(jax.random.PRNGKey(0), batch)

    mapping = ["node_init/Dense_0/kernel", "node_init/Dense_0/bias",
               "edge_init/Dense_0/kernel", "edge_init/Dense_0/bias"]
    for i in range(2):
        mapping += [f"message_{i}/dense_attend/Dense_0/kernel",
                    f"message_{i}/dense_attend/Dense_0/bias",
                    f"message_{i}/dense_align/Dense_0/kernel",
                    f"message_{i}/dense_align/Dense_0/bias",
                    f"message_{i}/dense_e/Dense_0/kernel",
                    f"message_{i}/dense_e/Dense_0/bias",
                    f"gru_union_{i}/kernel",
                    f"gru_union_{i}/recurrent_kernel",
                    f"gru_union_{i}/bias"]
    mapping += ["fingerprint/vertex2mol/Dense_0/kernel",
                "fingerprint/vertex2mol/Dense_0/bias"]
    for t in range(2):
        mapping += [f"fingerprint/attend_{t}/Dense_0/kernel",
                    f"fingerprint/attend_{t}/Dense_0/bias",
                    f"fingerprint/align_{t}/Dense_0/kernel",
                    f"fingerprint/align_{t}/Dense_0/bias"]
    for t in range(2):
        mapping += [f"fingerprint/gru_{t}/kernel",
                    f"fingerprint/gru_{t}/recurrent_kernel",
                    f"fingerprint/gru_{t}/bias"]
    mapping += ["out_mlp/dense_0/Dense_0/kernel", "out_mlp/dense_0/Dense_0/bias",
                "out_mlp/dense_1/Dense_0/kernel", "out_mlp/dense_1/Dense_0/bias",
                "out_mlp/dense_2/Dense_0/kernel"]
    params = _apply_mapping(params, weights, mapping)
    out = model.apply(params, batch)["output"]
    out = np.asarray(out)[:len(graphs)]
    np.testing.assert_allclose(out, ref_out, rtol=1e-4, atol=2e-5)


def test_mat_matches_reference():
    graphs, weights, ref_out = _load("mat")
    for g in graphs:
        g.pop("z")
        g["node_coordinates"] = g.pop("xyz")
    batch = batch_graphs(graphs)

    from gcnn_keras_tpu.models.mat import make_model
    model = make_model(depth=2, heads=2)
    params = model.init(jax.random.PRNGKey(0), batch)

    mapping = ["proj/kernel",
               "ln1_0/scale", "ln1_0/bias",
               "adj_proj/kernel"]
    for i in range(2):
        if i > 0:
            mapping += [f"ln1_{i}/scale", f"ln1_{i}/bias"]
        for j in range(2):
            mapping += [f"att_{i}_{j}/dense_q/kernel", f"att_{i}_{j}/dense_q/bias",
                        f"att_{i}_{j}/dense_k/kernel", f"att_{i}_{j}/dense_k/bias",
                        f"att_{i}_{j}/dense_v/kernel", f"att_{i}_{j}/dense_v/bias"]
        mapping += [f"merge_{i}/kernel",
                    f"ln2_{i}/scale", f"ln2_{i}/bias"]
        for k in range(3):
            mapping += [f"ff_{i}/dense_{k}/Dense_0/kernel",
                        f"ff_{i}/dense_{k}/Dense_0/bias"]
        mapping += [f"ff_proj_{i}/kernel"]
    mapping += ["ln_out/scale", "ln_out/bias"]
    for k in range(3):
        mapping += [f"out_mlp/dense_{k}/Dense_0/kernel",
                    f"out_mlp/dense_{k}/Dense_0/bias"]
    params = _apply_mapping(params, weights, mapping)
    out = model.apply(params, batch)["output"]
    out = np.asarray(out)[:len(graphs)]
    np.testing.assert_allclose(out, ref_out, rtol=1e-4, atol=2e-5)


def test_megan_matches_reference():
    graphs, weights, ref_out = _load("megan")
    d = np.load(os.path.join(ASSETS, "ref_golden_megan.npz"))
    ref_node_imp, ref_edge_imp = d["out1"], d["out2"]
    eis = [g["edge_indices"].copy() for g in graphs]
    for g in graphs:
        g.pop("z"); g.pop("xyz")
    batch = batch_graphs(graphs)

    from gcnn_keras_tpu.models.megan import make_model
    model = make_model(units=[16, 16], importance_channels=2,
                       importance_units=[8], final_units=[8, 1])
    params = model.init(jax.random.PRNGKey(0), batch)

    mapping = []
    for i in range(2):
        for k in range(2):
            mapping += [f"att_{i}/head_{k}_linear/Dense_0/kernel",
                        f"att_{i}/head_{k}_linear/Dense_0/bias",
                        f"att_{i}/head_{k}_alpha_act/Dense_0/kernel",
                        f"att_{i}/head_{k}_alpha_act/Dense_0/bias",
                        f"att_{i}/head_{k}_alpha/Dense_0/kernel"]
    mapping += ["node_imp_0/Dense_0/kernel", "node_imp_0/Dense_0/bias",
                "node_imp_1/Dense_0/kernel", "node_imp_1/Dense_0/bias",
                "final_0/Dense_0/kernel", "final_0/Dense_0/bias",
                "final_1/Dense_0/kernel", "final_1/Dense_0/bias"]
    params = _apply_mapping(params, weights, mapping)
    out = model.apply(params, batch)
    pred = np.asarray(out["output"])[:len(graphs)]
    np.testing.assert_allclose(pred, ref_out, rtol=1e-4, atol=2e-5)

    # node importances: node order is preserved by the batcher
    node_imp = np.asarray(out["node_importances"])
    n_off = 0
    for gi, g in enumerate(graphs):
        n = len(g["node_attributes"])
        np.testing.assert_allclose(node_imp[n_off:n_off + n],
                                   ref_node_imp[gi, :n], rtol=1e-4, atol=2e-5)
        n_off += n

    # edge importances: the batcher stably sorts edges by receiver
    edge_imp = np.asarray(out["edge_importances"])
    e_off = 0
    for gi, ei in enumerate(eis):
        m = len(ei)
        perm = np.argsort(ei[:, 0], kind="stable")
        np.testing.assert_allclose(edge_imp[e_off:e_off + m],
                                   ref_edge_imp[gi, :m][perm],
                                   rtol=1e-4, atol=2e-5)
        e_off += m


def test_mxmnet_matches_reference():
    """Faithful MXMNet: dual edge sets (local bond + global range graph),
    two angle-pair lists (edge_pairing 'jk' and 'ik' + self-edges), shared
    propagate/h_mlp weights, mean-pooled global track."""
    graphs, weights, ref_out = _load("mxmnet")
    for g in graphs:
        g["node_number"] = g.pop("z").astype(np.int64)
        g["node_coordinates"] = g["xyz"]

    # our preprocessor must reproduce the reference pair lists (as sets)
    from gcnn_keras_tpu.graph.preprocess import set_angle_pairs_kgcnn
    for g in graphs:
        mine1 = set_angle_pairs_kgcnn(
            {"edge_indices": g["edge_indices"],
             "node_number": g["node_number"]},
            range_indices="edge_indices", edge_pairing="jk",
            out_key="ai1")["ai1"]
        mine2 = set_angle_pairs_kgcnn(
            {"edge_indices": g["edge_indices"],
             "node_number": g["node_number"]},
            range_indices="edge_indices", edge_pairing="ik",
            allow_self_edges=True, out_key="ai2")["ai2"]
        for mine, ref in ((mine1, g["angle_indices_1"]),
                          (mine2, g["angle_indices_2"])):
            a = {tuple(r) for r in mine.tolist()}
            b = {tuple(r) for r in np.asarray(ref).tolist()}
            assert a == b

    batch = batch_graphs(graphs,
                         angle_edge_index_key="angle_indices_1",
                         angle_edge_index_key_2="angle_indices_2",
                         second_edge_index_key="range_indices")

    from gcnn_keras_tpu.models.mxmnet import make_model
    model = make_model(
        depth=2,
        input_embedding={"node": {"input_dim": 95, "output_dim": 32}},
        bessel_basis_local={"num_radial": 8, "cutoff": 5.0,
                            "envelope_exponent": 5},
        bessel_basis_global={"num_radial": 8, "cutoff": 6.0,
                             "envelope_exponent": 5},
        spherical_basis_local={"num_spherical": 3, "num_radial": 4,
                               "cutoff": 5.0, "envelope_exponent": 5},
        mlp_rbf_kwargs={"units": 32, "activation": "swish"},
        mlp_sbf_kwargs={"units": 32, "activation": "swish"},
        global_mp_kwargs={"units": 32},
        local_mp_kwargs={"units": 32, "output_units": 1,
                         "output_kernel_initializer": "glorot_uniform"},
        output_mlp={"use_bias": [True], "units": [1],
                    "activation": ["linear"]})
    params = model.init(jax.random.PRNGKey(0), batch)

    # trainable Bessel frequencies at init are n*pi (geom.py:751); ours are
    # closed-form
    np.testing.assert_allclose(weights[0], np.arange(1, 9) * np.pi, rtol=1e-6)
    np.testing.assert_allclose(weights[4], np.arange(1, 9) * np.pi, rtol=1e-6)

    def _d(path):  # raw Dense: kernel+bias
        return [f"{path}/Dense_0/kernel", f"{path}/Dense_0/bias"]

    def _res(path):  # ResidualLayer: two biased denses
        return _d(f"{path}/dense_1") + _d(f"{path}/dense_2")

    def _gmp(p):  # MXMGlobalMP weight order (attribute order in __init__)
        return (_d(f"{p}/h_mlp") + _res(f"{p}/res1") + _res(f"{p}/res2")
                + _res(f"{p}/res3") + _d(f"{p}/mlp") + _d(f"{p}/x_edge_mlp")
                + [f"{p}/linear/Dense_0/kernel"])

    def _lmp(p):  # MXMLocalMP weight order
        return (_d(f"{p}/mlp_kj") + _d(f"{p}/mlp_ji_1") + _d(f"{p}/mlp_ji_2")
                + _d(f"{p}/mlp_jj")
                + _d(f"{p}/mlp_sbf1/dense_0") + _d(f"{p}/mlp_sbf1/dense_1")
                + _d(f"{p}/mlp_sbf2/dense_0") + _d(f"{p}/mlp_sbf2/dense_1")
                + [f"{p}/lin_rbf1/Dense_0/kernel",
                   f"{p}/lin_rbf2/Dense_0/kernel"]
                + _res(f"{p}/res1") + _res(f"{p}/res2") + _res(f"{p}/res3")
                + [f"{p}/lin_rbf_out/Dense_0/kernel"]
                + _d(f"{p}/h_mlp")
                + _d(f"{p}/y_mlp/dense_0") + _d(f"{p}/y_mlp/dense_1")
                + _d(f"{p}/y_mlp/dense_2") + _d(f"{p}/y_W"))

    mapping = ([None, "embed_z/embedding"]
               + _d("mlp_rbf_g/dense_0") + [None]
               + _gmp("global_0")
               + _d("mlp_rbf_l/dense_0") + _d("mlp_sbf_1/dense_0")
               + _d("mlp_sbf_2/dense_0")
               + _lmp("local_0") + _gmp("global_1") + _lmp("local_1")
               + _d("output_mlp/dense_0"))
    params = _apply_mapping(params, weights, mapping)
    out = model.apply(params, batch)["output"]
    out = np.asarray(out)[:len(graphs)]
    np.testing.assert_allclose(out, ref_out, rtol=2e-4, atol=1e-4)


def test_unet_matches_reference():
    """Graph U-Net: dense padded-adjacency rebuild of gPool/unpool/A^2 —
    remove-round(k*N)-lowest scoring, sigmoid gate, presence-mean GCN."""
    graphs, weights, ref_out = _load("unet")
    for g in graphs:
        g.pop("z", None)
        g.pop("xyz", None)
    batch = batch_graphs(graphs)

    from gcnn_keras_tpu.models.unet import make_model
    model = make_model(depth=2)
    params = model.init(jax.random.PRNGKey(0), batch)

    mapping = ["proj/Dense_0/kernel", "proj/Dense_0/bias",
               "down_0/Dense_0/kernel", "down_0/Dense_0/bias",
               "topk_0_score",
               "down_1/Dense_0/kernel", "down_1/Dense_0/bias",
               "topk_1_score",
               "up_1/Dense_0/kernel", "up_1/Dense_0/bias",
               "up_0/Dense_0/kernel", "up_0/Dense_0/bias",
               "out_mlp/dense_0/Dense_0/kernel", "out_mlp/dense_0/Dense_0/bias",
               "out_mlp/dense_1/Dense_0/kernel"]
    params = _apply_mapping(params, weights, mapping)
    out = model.apply(params, batch)["output"]
    out = np.asarray(out)[:len(graphs)]
    np.testing.assert_allclose(out, ref_out, rtol=2e-4, atol=1e-4)


def test_gcn_weighted_matches_reference():
    graphs, weights, ref_out = _load("gcn_weighted")
    for g in graphs:
        g.pop("z"); g.pop("xyz")
    batch = batch_graphs(graphs)

    from gcnn_keras_tpu.models.gcn import make_model_weighted
    model = make_model_weighted(
        depth=3,
        gcn_args={"units": 100, "activation": "relu", "pooling_method": "sum"},
        output_mlp={"units": [25, 10, 1],
                    "activation": ["relu", "relu", "sigmoid"],
                    "use_bias": [True, True, False]})
    params = model.init(jax.random.PRNGKey(0), batch)

    mapping = ["embed_to_units/Dense_0/kernel", "embed_to_units/Dense_0/bias"]
    for i in range(3):
        mapping += [f"gcn_{i}/Dense_0/Dense_0/kernel",
                    f"gcn_{i}/Dense_0/Dense_0/bias"]
    mapping += ["output/dense_0/Dense_0/kernel", "output/dense_0/Dense_0/bias",
                "output/dense_1/Dense_0/kernel", "output/dense_1/Dense_0/bias",
                "output/dense_2/Dense_0/kernel"]
    params = _apply_mapping(params, weights, mapping)
    out = model.apply(params, batch)["output"]
    out = np.asarray(out)[:len(graphs)]
    np.testing.assert_allclose(out, ref_out, rtol=1e-4, atol=2e-5)


def test_hdnnp4th_rep_matches_reference():
    graphs, _, _ = _load("hdnnp4th_rep")
    ref_rep = [g.pop("rep") for g in graphs]
    for g in graphs:
        g["node_number"] = g.pop("z").astype(np.int64)
        g["node_coordinates"] = g["xyz"]
    batch = batch_graphs(graphs, global_keys=("total_charge",))

    from gcnn_keras_tpu.models.hdnnp4th import make_model_rep
    model = make_model_rep(
        g2_kwargs={"eta": [0.0, 0.3], "rs": [0.0, 3.0], "rc": 10.0,
                   "elements": [1, 6, 8]},
        g4_kwargs={"eta": [0.0, 0.3], "lamda": [-1.0, 1.0], "rc": 6.0,
                   "zeta": [1.0, 8.0], "elements": [1, 6, 8],
                   "multiplicity": 2.0})
    params = model.init(jax.random.PRNGKey(0), batch)
    rep = np.asarray(model.apply(params, batch)["output"])
    gid = np.asarray(batch.graph_id)
    nm = np.asarray(batch.node_mask)
    for i, r in enumerate(ref_rep):
        np.testing.assert_allclose(rep[nm & (gid == i)], r,
                                   rtol=1e-4, atol=1e-5)


def test_hdnnp4th_learn_matches_reference():
    graphs, weights, ref_out = _load("hdnnp4th_learn")
    for g in graphs:
        g["node_number"] = g.pop("z").astype(np.int64)
        g["node_coordinates"] = g["xyz"]
    batch = batch_graphs(graphs, global_keys=("total_charge",))

    from gcnn_keras_tpu.models.hdnnp4th import make_model_learn
    model = make_model_learn(
        mlp_charge_kwargs={"units": [32, 32, 1], "num_relations": 9,
                           "activation": ["swish", "swish", "linear"]},
        mlp_local_kwargs={"units": [32, 32, 1], "num_relations": 9,
                          "activation": ["swish", "swish", "linear"]})
    params = model.init(jax.random.PRNGKey(0), batch)

    # w6/w7: the reference's physical hardness/sigma tables (non-trainable,
    # built from the same published constants here)
    mapping = ["mlp_charge/rel_dense_0/kernel", "mlp_charge/rel_dense_0/bias",
               "mlp_charge/rel_dense_1/kernel", "mlp_charge/rel_dense_1/bias",
               "mlp_charge/rel_dense_2/kernel", "mlp_charge/rel_dense_2/bias",
               None, None,
               "mlp_local/rel_dense_0/kernel", "mlp_local/rel_dense_0/bias",
               "mlp_local/rel_dense_1/kernel", "mlp_local/rel_dense_1/bias",
               "mlp_local/rel_dense_2/kernel", "mlp_local/rel_dense_2/bias"]
    weights = list(weights)
    for i in (1, 3, 5, 9, 11, 13):
        weights[i] = np.broadcast_to(weights[i], (9,) + weights[i].shape).copy()
    params = _apply_mapping(params, weights, mapping)
    out = model.apply(params, batch)
    energy = np.asarray(out["output"])[:len(graphs)]
    np.testing.assert_allclose(energy, ref_out, rtol=1e-4, atol=5e-5)
