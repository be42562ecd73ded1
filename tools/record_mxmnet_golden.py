"""Record a full-model golden for MXMNet from the reference implementation.

Runs the reference kgcnn MXMNet (TF CPU) on two fixed molecules with a
LOCAL bond graph (cutoff 1.2 A), a GLOBAL all-pairs range graph, and the
two angle-pair lists the reference preprocesses (get_angle_indices with
edge_pairing 'jk', and 'ik' with allow_self_edges=True —
training/hyper/hyper_md17_revised.py MXMNet methods). Saves inputs,
weights (model.weights order) and output to
tests/assets/ref_golden_mxmnet.npz.

Usage: TF_USE_LEGACY_KERAS=1 python tools/record_mxmnet_golden.py
"""
from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, "/root/reference")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from record_reference_goldens import fixed_molecules, save_golden  # noqa: E402

CONFIG = dict(
    input_embedding={"node": {"input_dim": 95, "output_dim": 32,
                              "embeddings_initializer": {
                                  "class_name": "RandomUniform",
                                  "config": {"minval": -1.7320508075688772,
                                             "maxval": 1.7320508075688772}}},
                     "edge": {"input_dim": 32, "output_dim": 32}},
    bessel_basis_local={"num_radial": 8, "cutoff": 5.0, "envelope_exponent": 5},
    bessel_basis_global={"num_radial": 8, "cutoff": 6.0, "envelope_exponent": 5},
    spherical_basis_local={"num_spherical": 3, "num_radial": 4, "cutoff": 5.0,
                           "envelope_exponent": 5},
    mlp_rbf_kwargs={"units": 32, "activation": "swish"},
    mlp_sbf_kwargs={"units": 32, "activation": "swish"},
    global_mp_kwargs={"units": 32},
    # glorot (not the reference default zeros) so the recorded output is
    # nonzero and the golden actually exercises the whole network
    local_mp_kwargs={"units": 32, "output_units": 1,
                     "output_kernel_initializer": "glorot_uniform"},
    use_edge_attributes=False,
    depth=2,
    node_pooling_args={"pooling_method": "sum"},
    output_embedding="graph", output_to_tensor=True,
    use_output_mlp=True,
    output_mlp={"use_bias": [True], "units": [1], "activation": ["linear"]},
)


def build_graphs():
    from kgcnn.graph.adj import get_angle_indices
    graphs = fixed_molecules()
    out = []
    for g in graphs:
        xyz = g["xyz"]
        n = len(g["z"])
        d = np.linalg.norm(xyz[:, None] - xyz[None, :], axis=-1)
        # local bond graph: pairs within 1.2 A
        loc = np.array([[i, j] for i in range(n) for j in range(n)
                        if i != j and d[i, j] < 1.2], dtype=np.int64)
        # global range graph: all pairs
        rng = np.array([[i, j] for i in range(n) for j in range(n) if i != j],
                       dtype=np.int64)
        _, _, ai1 = get_angle_indices(loc, edge_pairing="jk")
        _, _, ai2 = get_angle_indices(loc, edge_pairing="ik",
                                      allow_self_edges=True)
        out.append({"z": g["z"], "xyz": xyz, "edge_indices": loc,
                    "range_indices": rng,
                    "angle_indices_1": np.asarray(ai1, dtype=np.int64),
                    "angle_indices_2": np.asarray(ai2, dtype=np.int64),
                    "edge_weights": np.ones((len(loc), 1), dtype=np.float32)})
    return out


def main():
    import tensorflow as tf
    tf.config.set_visible_devices([], "GPU")
    import tf_keras as ks

    # The reference registers `swish` as a Layer CLASS under 'kgcnn>swish'
    # (kgcnn/ops/activ.py:83); this tf_keras resolves it via activations.get
    # and then calls the class with the input tensor as `beta`. Override the
    # registration with the equivalent plain function (beta=1).
    ks.utils.get_custom_objects()["kgcnn>swish"] = \
        lambda x: x * tf.sigmoid(x)
    import tf_keras.src.activations as _acts
    _orig_get = _acts.get

    def _patched_get(identifier):
        if isinstance(identifier, str) and identifier == "kgcnn>swish":
            return lambda x: x * tf.sigmoid(x)
        return _orig_get(identifier)

    _acts.get = _patched_get

    from kgcnn.literature.MXMNet import make_model

    tf.keras.utils.set_random_seed(23)
    graphs = build_graphs()

    def rag(key, inner=None, dtype="float32"):
        return tf.ragged.constant(
            [g[key] for g in graphs], ragged_rank=1,
            inner_shape=(inner,) if inner else (), dtype=dtype)

    inputs = [
        rag("z", dtype="float32"),
        tf.ragged.constant([g["xyz"] for g in graphs], ragged_rank=1,
                           inner_shape=(3,)),
        rag("edge_weights", inner=1),
        rag("edge_indices", inner=2, dtype="int64"),
        rag("angle_indices_1", inner=2, dtype="int64"),
        rag("angle_indices_2", inner=2, dtype="int64"),
        rag("range_indices", inner=2, dtype="int64"),
    ]
    model = make_model(inputs=[
        {"shape": (None,), "name": "node_number", "dtype": "float32", "ragged": True},
        {"shape": (None, 3), "name": "node_coordinates", "dtype": "float32", "ragged": True},
        {"shape": (None, 1), "name": "edge_weights", "dtype": "float32", "ragged": True},
        {"shape": (None, 2), "name": "edge_indices", "dtype": "int64", "ragged": True},
        {"shape": (None, 2), "name": "angle_indices_1", "dtype": "int64", "ragged": True},
        {"shape": (None, 2), "name": "angle_indices_2", "dtype": "int64", "ragged": True},
        {"shape": (None, 2), "name": "range_indices", "dtype": "int64", "ragged": True},
    ], **CONFIG)
    out = model(inputs, training=False)
    save_golden("mxmnet", model, graphs, out)
    for i, w in enumerate(model.weights):
        print(f"w{i:03d} {w.name} {tuple(w.shape)}")


if __name__ == "__main__":
    main()
