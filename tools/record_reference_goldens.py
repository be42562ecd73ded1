"""Record golden activations from the reference kgcnn implementation.

Runs the reference (``/root/reference`` on sys.path, TF CPU with
``TF_USE_LEGACY_KERAS=1``) on fixed small molecules and saves inputs, all
layer weights (in ``model.weights`` order), and outputs to
``tests/assets/ref_golden_<model>.npz``. The parity tests
(``tests/test_reference_parity.py``) load these fixtures, copy the weights
into this framework's models, and assert the full-model outputs match —
the strongest cross-implementation check available (SURVEY.md §6: per-layer
allclose against the reference).

Usage:  TF_USE_LEGACY_KERAS=1 python tools/record_reference_goldens.py
"""
from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, "/root/reference")

ASSETS = os.path.join(os.path.dirname(__file__), "..", "tests", "assets")


def fixed_molecules():
    """Fixed rigid molecules; all-pairs directed edges (i != j).

    Widened per VERDICT r1 weak item 3: four molecules, 3-17 atoms,
    elements {H, C, N, O, F} (tools/golden_molecules.py), including a
    17-atom multi-element chain."""
    from golden_molecules import wide_set
    mols = wide_set()
    graphs = []
    for z, xyz in mols:
        n = len(z)
        ei = np.array([[i, j] for i in range(n) for j in range(n) if i != j],
                      dtype=np.int64)
        graphs.append({"z": z, "xyz": xyz, "edge_indices": ei})
    return graphs


def to_ragged(graphs):
    import tensorflow as tf
    z = tf.ragged.constant([g["z"].astype(np.float32) for g in graphs],
                           ragged_rank=1)
    xyz = tf.ragged.constant([g["xyz"] for g in graphs], ragged_rank=1,
                             inner_shape=(3,))
    ei = tf.ragged.constant([g["edge_indices"] for g in graphs],
                            ragged_rank=1, inner_shape=(2,), dtype="int64")
    return z, xyz, ei


def save_golden(name, model, inputs_np, out):
    graphs = inputs_np
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


def record_schnet():
    from kgcnn.literature.Schnet import make_model
    np.random.seed(7)
    import tensorflow as tf
    tf.keras.utils.set_random_seed(7)
    model = make_model(depth=2)
    graphs = fixed_molecules()
    out = model(to_ragged(graphs), training=False)
    save_golden("schnet", model, graphs, out)


def record_painn():
    from kgcnn.literature.PAiNN import make_model
    import tensorflow as tf
    tf.keras.utils.set_random_seed(11)
    model = make_model(depth=2)
    graphs = fixed_molecules()
    out = model(to_ragged(graphs), training=False)
    save_golden("painn", model, graphs, out)


def record_gcn():
    from kgcnn.literature.GCN import make_model
    import tensorflow as tf
    tf.keras.utils.set_random_seed(13)
    model = make_model(depth=3)
    rs = np.random.RandomState(3)
    graphs = fixed_molecules()
    # GCN wants node features + edge weights
    for g in graphs:
        g["node_attributes"] = rs.randn(len(g["z"]), 8).astype(np.float32)
        g["edge_weights"] = rs.rand(len(g["edge_indices"]), 1).astype(np.float32)
    nodes = tf.ragged.constant([g["node_attributes"] for g in graphs],
                               ragged_rank=1, inner_shape=(8,))
    ew = tf.ragged.constant([g["edge_weights"] for g in graphs],
                            ragged_rank=1, inner_shape=(1,))
    ei = tf.ragged.constant([g["edge_indices"] for g in graphs],
                            ragged_rank=1, inner_shape=(2,), dtype="int64")
    model = make_model(depth=3, inputs=[
        {"shape": (None, 8), "name": "node_attributes", "dtype": "float32",
         "ragged": True},
        {"shape": (None, 1), "name": "edge_weights", "dtype": "float32",
         "ragged": True},
        {"shape": (None, 2), "name": "edge_indices", "dtype": "int64",
         "ragged": True}],
        input_embedding={"node": {"input_dim": 95, "output_dim": 64},
                         "edge": {"input_dim": 10, "output_dim": 64}})
    out = model([nodes, ew, ei], training=False)
    save_golden("gcn", model, graphs, out)


# (execution happens in the single __main__ block at the bottom of the file,
# AFTER patch_legacy_activations is defined — the patch must be applied
# before any kgcnn module import binds tf_keras activation resolution.)


def _molnet_inputs(node_dim=8, edge_dim=5, seed=5):
    import tensorflow as tf
    rs = np.random.RandomState(seed)
    graphs = fixed_molecules()
    for g in graphs:
        g["node_attributes"] = rs.randn(len(g["z"]), node_dim).astype(np.float32)
        g["edge_attributes"] = rs.rand(len(g["edge_indices"]),
                                       edge_dim).astype(np.float32)
    nodes = tf.ragged.constant([g["node_attributes"] for g in graphs],
                               ragged_rank=1, inner_shape=(node_dim,))
    ea = tf.ragged.constant([g["edge_attributes"] for g in graphs],
                            ragged_rank=1, inner_shape=(edge_dim,))
    ei = tf.ragged.constant([g["edge_indices"] for g in graphs],
                            ragged_rank=1, inner_shape=(2,), dtype="int64")
    return graphs, nodes, ea, ei


def _record_molnet(name, seed, **kwargs):
    import tensorflow as tf
    mod = __import__(f"kgcnn.literature.{name}", fromlist=["make_model"])
    tf.keras.utils.set_random_seed(seed)
    graphs, nodes, ea, ei = _molnet_inputs()
    inputs = [
        {"shape": (None, 8), "name": "node_attributes", "dtype": "float32",
         "ragged": True},
        {"shape": (None, 5), "name": "edge_attributes", "dtype": "float32",
         "ragged": True},
        {"shape": (None, 2), "name": "edge_indices", "dtype": "int64",
         "ragged": True}]
    model = mod.make_model(inputs=inputs, **kwargs)
    out = model([nodes, ea, ei], training=False)
    save_golden(name.lower(), model, graphs, out)


def record_gin():
    # GIN ignores edge features; plain variant takes [nodes, edge_indices]
    import tensorflow as tf
    from kgcnn.literature.GIN import make_model
    tf.keras.utils.set_random_seed(17)
    graphs, nodes, ea, ei = _molnet_inputs()
    model = make_model(depth=2, inputs=[
        {"shape": (None, 8), "name": "node_attributes", "dtype": "float32",
         "ragged": True},
        {"shape": (None, 2), "name": "edge_indices", "dtype": "int64",
         "ragged": True}],
        output_mlp={"use_bias": True, "units": 1, "activation": "linear"})
    out = model([nodes, ei], training=False)
    save_golden("gin", model, graphs, out)


def record_gatv2():
    # config mirrors tests/test_reference_parity.py::test_gatv2
    _record_molnet("GATv2", 19, depth=1, attention_heads_num=2,
                   attention_args={"units": 32, "use_edge_features": True,
                                   "use_bias": True, "activation": "relu",
                                   "use_final_activation": False,
                                   "has_self_loops": True},
                   output_mlp={"use_bias": [True, True], "units": [32, 1],
                               "activation": ["relu", "linear"]})


def patch_legacy_activations():
    """TF 2.21 legacy-keras deserializes string activations like
    'kgcnn>leaky_relu' to the registered CLASS and then calls it as a
    function, passing the tensor into __init__ (breaks AttentiveFP/MEGAN in
    the reference itself). Patch activations.get to return an instance with
    default config instead."""
    import tf_keras as ks
    from tf_keras.src import activations as act_src
    orig = act_src.get

    def patched(identifier):
        if isinstance(identifier, str) and identifier.startswith("kgcnn>"):
            import inspect
            from tf_keras.src.saving.object_registration import \
                get_custom_objects
            cls = get_custom_objects().get(identifier)
            if cls is not None:
                # registered CLASSES (leaky_relu etc.) need instantiation;
                # plain registered FUNCTIONS (shifted_softplus) are the
                # activation already
                return cls() if inspect.isclass(cls) else cls
        return orig(identifier)

    act_src.get = patched
    ks.activations.get = patched


def record_attentivefp():
    patch_legacy_activations()
    _record_molnet("AttentiveFP", 31, depthato=2, depthmol=2,
                   attention_args={"units": 32},
                   output_mlp={"units": [16, 1], "use_bias": [True, True],
                               "activation": ["kgcnn>leaky_relu", "linear"]})


def record_graphsage():
    _record_molnet("GraphSAGE", 23, depth=2)


def record_dmpnn():
    import tensorflow as tf
    from kgcnn.literature.DMPNN import make_model
    from kgcnn.graph.adj import compute_reverse_edges_index_map
    tf.keras.utils.set_random_seed(29)
    graphs, nodes, ea, ei = _molnet_inputs()
    for g in graphs:
        g["edge_indices_reverse"] = compute_reverse_edges_index_map(
            g["edge_indices"]).astype(np.int64)
    rev = tf.ragged.constant(
        [g["edge_indices_reverse"][:, None] for g in graphs],
        ragged_rank=1, inner_shape=(1,), dtype="int64")
    # explicit featurized inputs (no OptionalInputEmbedding): matches the
    # recorded fixture's 11-weight layout
    model = make_model(depth=2, inputs=[
        {"shape": (None, 8), "name": "node_attributes", "dtype": "float32",
         "ragged": True},
        {"shape": (None, 5), "name": "edge_attributes", "dtype": "float32",
         "ragged": True},
        {"shape": (None, 2), "name": "edge_indices", "dtype": "int64",
         "ragged": True},
        {"shape": (None, 1), "name": "edge_indices_reverse",
         "dtype": "int64", "ragged": True}])
    out = model([nodes, ea, ei, rev], training=False)
    save_golden("dmpnn", model, graphs, out)


def record_hamnet():
    """HamNet with featurized node/edge inputs + coordinates
    (HamNet.py:108-172)."""
    import tensorflow as tf
    patch_legacy_activations()
    from kgcnn.literature.HamNet import make_model
    tf.keras.utils.set_random_seed(41)
    graphs, nodes, ea, ei = _molnet_inputs(seed=41)
    xyz = tf.ragged.constant([g["xyz"] for g in graphs], ragged_rank=1,
                             inner_shape=(3,))
    model = make_model(
        inputs=[
            {"shape": (None, 8), "name": "node_attributes",
             "dtype": "float32", "ragged": True},
            {"shape": (None, 5), "name": "edge_attributes",
             "dtype": "float32", "ragged": True},
            {"shape": (None, 2), "name": "edge_indices", "dtype": "int64",
             "ragged": True},
            {"shape": (None, 3), "name": "node_coordinates",
             "dtype": "float32", "ragged": True}],
        depth=2,
        message_kwargs={"units": 32, "units_edge": 32},
        fingerprint_kwargs={"units": 32, "units_attend": 32, "depth": 2},
        gru_kwargs={"units": 32})
    out = model([nodes, ea, ei, xyz], training=False)
    save_golden("hamnet", model, graphs, out)




def record_mat():
    """MAT with featurized nodes, coordinates, scalar edge weights
    (MAT.py:113-200)."""
    import tensorflow as tf
    from kgcnn.literature.MAT import make_model
    tf.keras.utils.set_random_seed(43)
    rs = np.random.RandomState(43)
    graphs = fixed_molecules()
    for g in graphs:
        g["node_attributes"] = rs.randn(len(g["z"]), 8).astype(np.float32)
        g["edge_weights"] = rs.rand(len(g["edge_indices"]), 1).astype(np.float32)
    nodes = tf.ragged.constant([g["node_attributes"] for g in graphs],
                               ragged_rank=1, inner_shape=(8,))
    xyz = tf.ragged.constant([g["xyz"] for g in graphs], ragged_rank=1,
                             inner_shape=(3,))
    ew = tf.ragged.constant([g["edge_weights"] for g in graphs],
                            ragged_rank=1, inner_shape=(1,))
    ei = tf.ragged.constant([g["edge_indices"] for g in graphs],
                            ragged_rank=1, inner_shape=(2,), dtype="int64")
    model = make_model(
        inputs=[
            {"shape": (None, 8), "name": "node_attributes",
             "dtype": "float32", "ragged": True},
            {"shape": (None, 3), "name": "node_coordinates",
             "dtype": "float32", "ragged": True},
            {"shape": (None, 1), "name": "edge_weights", "dtype": "float32",
             "ragged": True},
            {"shape": (None, 2), "name": "edge_indices", "dtype": "int64",
             "ragged": True}],
        depth=2, heads=2)
    out = model([nodes, xyz, ew, ei], training=False)
    save_golden("mat", model, graphs, out)




def record_megan():
    """MEGAN subclassed model with importance outputs (MEGAN.py:43-345)."""
    import tensorflow as tf
    patch_legacy_activations()
    from kgcnn.literature.MEGAN import MEGAN
    tf.keras.utils.set_random_seed(47)
    graphs, nodes, ea, ei = _molnet_inputs(seed=47)
    model = MEGAN(units=[16, 16], importance_channels=2,
                  importance_units=[8], final_units=[8, 1],
                  use_edge_features=True, return_importances=True)
    out, node_imp, edge_imp = model([nodes, ea, ei], training=False)
    payload_graphs = graphs
    save_golden("megan", model, payload_graphs, [np.asarray(out),
                np.asarray(node_imp.to_tensor()),
                np.asarray(edge_imp.to_tensor())])


ALL_RECORDERS = ("schnet", "painn", "gcn", "gin", "gatv2", "attentivefp",
                 "graphsage", "dmpnn", "hamnet", "mat", "megan")

if __name__ == "__main__":
    import tensorflow as tf
    tf.config.set_visible_devices([], "GPU")
    patch_legacy_activations()
    names = os.environ.get("RECORD_ONLY", ",".join(ALL_RECORDERS)).split(",")
    failed = []
    for fname in names:
        try:
            globals()[f"record_{fname}"]()
        except Exception:
            import traceback
            print(f"--- record_{fname} failed:")
            traceback.print_exc(limit=5)
            failed.append(fname)
    if failed:
        sys.exit(f"FAILED recorders: {failed}")
