"""Capture per-block intermediates from the reference MXMNet to localize
a parity divergence. Appends captured arrays to the existing golden npz
as dbg_* keys.

Usage: TF_USE_LEGACY_KERAS=1 python tools/debug_mxmnet_intermediates.py
"""
from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, "/root/reference")
sys.path.insert(0, os.path.dirname(__file__))

from record_mxmnet_golden import CONFIG, build_graphs  # noqa: E402

ASSETS = os.path.join(os.path.dirname(__file__), "..", "tests", "assets")


def main():
    import tensorflow as tf
    tf.config.set_visible_devices([], "GPU")
    import tf_keras as ks
    ks.utils.get_custom_objects()["kgcnn>swish"] = \
        lambda x: x * tf.sigmoid(x)
    import tf_keras.src.activations as _acts
    _orig_get = _acts.get

    def _patched_get(identifier):
        if isinstance(identifier, str) and identifier == "kgcnn>swish":
            return lambda x: x * tf.sigmoid(x)
        return _orig_get(identifier)

    _acts.get = _patched_get

    from kgcnn.layers.conv import mxmnet_conv
    from kgcnn.layers import geom as geom_mod
    from kgcnn.layers.conv import dimenet_conv

    captured = {}

    def wrap(cls, tag):
        orig = cls.call

        def call(self, inputs, **kwargs):
            out = orig(self, inputs, **kwargs)
            items = out if isinstance(out, (list, tuple)) else [out]
            for oi, o in enumerate(items):
                v = o.values if hasattr(o, "values") else o
                if hasattr(v, "numpy"):
                    captured.setdefault(f"{tag}", []).append(
                        np.asarray(v.numpy()))
            return out

        cls.call = call

    wrap(mxmnet_conv.MXMGlobalMP, "gmp")
    wrap(mxmnet_conv.MXMLocalMP, "lmp")
    wrap(geom_mod.BesselBasisLayer, "rbf")
    wrap(dimenet_conv.SphericalBasisLayer, "sbf")
    wrap(geom_mod.EdgeAngle, "ang")

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
    captured.clear()
    out = model(inputs, training=False)
    print("out", np.asarray(out).ravel())

    path = os.path.join(ASSETS, "ref_golden_mxmnet.npz")
    payload = dict(np.load(path))
    for tag, arrs in captured.items():
        for i, a in enumerate(arrs):
            payload[f"dbg_{tag}_{i}"] = a
            print(f"dbg_{tag}_{i} {a.shape} {a.reshape(-1)[:3]}")
    np.savez(path, **payload)


if __name__ == "__main__":
    main()
