"""Record goldens from the reference for the builder variants added for
full API parity: GCN.make_model_weighted (kgcnn/literature/GCN.py:132) and
the HDNNP4th rep/learn split (kgcnn/literature/HDNNP4th.py:315,337).

Reuses the input graphs already stored in the existing fixtures
(ref_golden_gcn.npz / ref_golden_hdnnp4th.npz) so the new goldens share the
same molecules.

Usage: TF_USE_LEGACY_KERAS=1 TF_CPP_MIN_LOG_LEVEL=3 python tools/record_variant_goldens.py
"""
from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, "/root/reference")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

ASSETS = os.path.join(os.path.dirname(__file__), "..", "tests", "assets")


def _graphs_from(name):
    d = np.load(os.path.join(ASSETS, f"ref_golden_{name}.npz"))
    n = int(d["n_graphs"])
    return [{k[len(f"g{i}_"):]: d[k] for k in d.files
             if k.startswith(f"g{i}_")} for i in range(n)]


def save_golden(name, model, graphs, out):
    payload = {}
    for i, g in enumerate(graphs):
        for k, v in g.items():
            payload[f"g{i}_{k}"] = v
    payload["n_graphs"] = np.array(len(graphs))
    for wi, w in enumerate(model.weights):
        payload[f"w{wi:03d}"] = w.numpy()
        payload[f"wname{wi:03d}"] = np.array(w.name)
    if isinstance(out, (list, tuple)):
        for oi, o in enumerate(out):
            payload[f"out{oi}"] = np.asarray(o)
    else:
        payload["out0"] = np.asarray(out)
    path = os.path.join(ASSETS, f"ref_golden_{name}.npz")
    np.savez(path, **payload)
    print(f"saved {path}: {len(model.weights)} weights, out0 "
          f"{payload['out0'].shape} = {payload['out0'].reshape(-1)[:4]}")


def _rag(vals, inner, dtype="float32"):
    import tensorflow as tf
    return tf.ragged.constant(vals, ragged_rank=1, inner_shape=inner,
                              dtype=dtype)


def record_gcn_weighted():
    import tensorflow as tf
    from kgcnn.literature.GCN import make_model_weighted
    tf.keras.utils.set_random_seed(13)
    graphs = _graphs_from("gcn")
    rs = np.random.RandomState(11)
    for g in graphs:
        g["node_weights"] = rs.rand(len(g["node_attributes"]), 1).astype(
            np.float32)
    model = make_model_weighted(depth=3, inputs=[
        {"shape": (None, 8), "name": "node_attributes", "dtype": "float32",
         "ragged": True},
        {"shape": (None, 1), "name": "edge_weights", "dtype": "float32",
         "ragged": True},
        {"shape": (None, 2), "name": "edge_indices", "dtype": "int64",
         "ragged": True},
        {"shape": (None, 1), "name": "node_weights", "dtype": "float32",
         "ragged": True}])
    nodes = _rag([g["node_attributes"] for g in graphs], (8,))
    ew = _rag([g["edge_weights"] for g in graphs], (1,))
    ei = _rag([g["edge_indices"] for g in graphs], (2,), "int64")
    nw = _rag([g["node_weights"] for g in graphs], (1,))
    out = model([nodes, ew, ei, nw], training=False)
    save_golden("gcn_weighted", model, graphs, out)


ELEM = [1, 6, 8]
G2 = {"eta": [0.0, 0.3], "rs": [0.0, 3.0], "rc": 10.0, "elements": ELEM}
G4 = {"eta": [0.0, 0.3], "lamda": [-1.0, 1.0], "rc": 6.0,
      "zeta": [1.0, 8.0], "elements": ELEM, "multiplicity": 2.0}
MLP9 = {"units": [32, 32, 1], "num_relations": 9,
        "activation": ["swish", "swish", "linear"]}


def record_hdnnp4th_rep_learn():
    import tensorflow as tf
    from kgcnn.literature.HDNNP4th import make_model_rep, make_model_learn
    tf.keras.utils.set_random_seed(17)
    graphs = _graphs_from("hdnnp4th")

    z = _rag([g["z"] for g in graphs], (), "int64")
    xyz = _rag([g["xyz"] for g in graphs], (3,))
    ei = _rag([g["edge_indices"] for g in graphs], (2,), "int64")
    ai = _rag([g["angle_indices_nodes"] for g in graphs], (3,), "int64")
    esp = _rag([g["esp"] for g in graphs], ())
    qtot = tf.constant(np.stack([g["total_charge"] for g in graphs]))

    rep_model = make_model_rep(inputs=[
        {"shape": (None,), "name": "node_number", "dtype": "int64", "ragged": True},
        {"shape": (None, 3), "name": "node_coordinates", "dtype": "float32", "ragged": True},
        {"shape": (None, 2), "name": "range_indices", "dtype": "int64", "ragged": True},
        {"shape": (None, 3), "name": "angle_indices_nodes", "dtype": "int64", "ragged": True}],
        name="HDNNP4th_rep", verbose=10, g2_kwargs=G2, g4_kwargs=G4)
    rep = rep_model([z, xyz, ei, ai], training=False)
    rep_np = [rep[i].numpy() for i in range(len(graphs))]
    for g, r in zip(graphs, rep_np):
        g["rep"] = r
    # rep is ragged → store padded-to-dense per graph (variable N handled
    # by per-graph keys); output saved as the first graph's rep for shape
    save_golden("hdnnp4th_rep", rep_model, graphs, rep.to_tensor())

    n_rep = rep_np[0].shape[-1]
    learn_model = make_model_learn(
        inputs=[
            {"shape": (None,), "name": "node_number", "dtype": "int64", "ragged": True},
            {"shape": (None, 3), "name": "node_coordinates", "dtype": "float32", "ragged": True},
            {"shape": (None, 2), "name": "range_indices", "dtype": "int64", "ragged": True},
            {"shape": (None, 3), "name": "angle_indices_nodes", "dtype": "int64", "ragged": True},
            {"shape": (1,), "name": "total_charge", "dtype": "float32", "ragged": False},
            {"shape": (None, n_rep), "name": "rep", "dtype": "float32", "ragged": True},
            {"shape": (None,), "name": "esp", "dtype": "float32", "ragged": True}],
        node_pooling_args={"pooling_method": "sum"}, name="HDNNP4th_learn",
        verbose=10, normalize_kwargs={}, mlp_charge_kwargs=dict(MLP9),
        mlp_local_kwargs=dict(MLP9), cent_kwargs={},
        electrostatic_kwargs={"use_physical_params": True,
                              "param_trainable": False},
        qmmm_kwargs={}, output_embedding="graph", use_output_mlp=False,
        output_to_tensor=True, output_mlp={"use_bias": [True, True],
                                           "units": [16, 1],
                                           "activation": ["swish", "linear"]})
    rep_rag = _rag(rep_np, (n_rep,))
    out = learn_model([z, xyz, ei, ai, qtot, rep_rag, esp], training=False)
    save_golden("hdnnp4th_learn", learn_model, graphs, out)


if __name__ == "__main__":
    import tensorflow as tf
    tf.config.set_visible_devices([], "GPU")
    failures = []
    for fn in (record_gcn_weighted, record_hdnnp4th_rep_learn):
        try:
            fn()
        except Exception:
            import traceback
            print(f"--- {fn.__name__} failed:")
            traceback.print_exc(limit=8)
            failures.append(fn.__name__)
    if failures:
        # a partial regeneration must not exit 0 — stale fixtures would
        # silently survive
        sys.exit(f"golden recorders failed: {failures}")
