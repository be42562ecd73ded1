"""Crystal-variant golden parity (VERDICT r1 item 9): PAiNN / Megnet / NMPN
``make_crystal_model`` vs the executed reference, on three periodic cells
including one whose edges span >=2 lattice images — plus a bucketed
batch-shape sweep proving padding invariance of every crystal model."""
import os

import numpy as np
import pytest

import jax

from gcnn_keras_tpu.batch import batch_graphs

from tests.test_reference_parity import _apply_mapping, painn_mapping

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
    return graphs, weights, d["out0"]


def _prepare(graphs, with_state=False):
    prepared = []
    for g in graphs:
        p = {"node_number": g["z"].astype(np.int64),
             "node_coordinates": g["xyz"],
             "edge_indices": g["edge_indices"],
             "range_image": g["edge_image"].astype(np.int64),
             "graph_lattice": g["lattice"].astype(np.float32)}
        if with_state:
            p["graph_attributes"] = g["graph_attributes"]
        prepared.append(p)
    keys = ("graph_lattice", "graph_attributes") if with_state \
        else ("graph_lattice",)
    return prepared, keys


def _check_with_padding_sweep(model, params, prepared, keys, ref_out,
                              pads=((None, None), (512, 2048))):
    """Assert parity AND bucketed-shape invariance: the same model+weights
    on two different static batch shapes must give identical outputs."""
    outs = []
    for n_pad, e_pad in pads:
        batch = batch_graphs(prepared, n_node_pad=n_pad, n_edge_pad=e_pad,
                             global_keys=keys)
        out = np.asarray(model.apply(params, batch)["output"])
        outs.append(out[:len(prepared)])
    np.testing.assert_allclose(outs[0], ref_out, rtol=1e-4, atol=2e-5)
    np.testing.assert_allclose(outs[1], outs[0], rtol=1e-6, atol=1e-7)


def test_painn_crystal_matches_reference():
    graphs, weights, ref_out = _load("painn_crystal")
    prepared, keys = _prepare(graphs)
    batch = batch_graphs(prepared, global_keys=keys)

    from gcnn_keras_tpu.models.painn import make_crystal_model
    model = make_crystal_model(depth=2)
    params = model.init(jax.random.PRNGKey(0), batch)
    np.testing.assert_allclose(weights[1], np.arange(1, 21) * np.pi,
                               rtol=1e-6)
    params = _apply_mapping(params, weights, painn_mapping(depth=2))
    _check_with_padding_sweep(model, params, prepared, keys, ref_out)


def test_megnet_crystal_matches_reference():
    graphs, weights, ref_out = _load("megnet_crystal")
    prepared, keys = _prepare(graphs, with_state=True)
    batch = batch_graphs(prepared, global_keys=keys)

    from gcnn_keras_tpu.models.megnet import make_crystal_model
    model = make_crystal_model(nblocks=1)
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
    _check_with_padding_sweep(model, params, prepared, keys, ref_out)


def test_nmpn_crystal_matches_reference():
    graphs, weights, ref_out = _load("nmpn_crystal")
    prepared, keys = _prepare(graphs)
    batch = batch_graphs(prepared, global_keys=keys)

    from gcnn_keras_tpu.models.nmpn import make_crystal_model
    model = make_crystal_model(depth=2, make_distance=True,
                               expand_distance=True,
                               output_mlp={"units": [25, 10, 1],
                                           "activation": ["selu", "selu",
                                                          "sigmoid"],
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
    _check_with_padding_sweep(model, params, prepared, keys, ref_out)


def test_multi_image_edges_present():
    """The fixture must exercise >=2-image periodic edges (VERDICT item 9)."""
    graphs, _, _ = _load("painn_crystal")
    assert any(np.any(np.abs(g["edge_image"]) >= 2) for g in graphs)
