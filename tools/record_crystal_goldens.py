"""Record crystal-variant goldens from the reference ``make_crystal_model``
builders (VERDICT r1 item 9: PAiNN/Megnet/NMPN previously had no crystal
golden; also a >=2-image periodic cell).

Structures: NaCl rocksalt conventional cell (8 atoms), a triclinic 3-atom
cell, and a SMALL 1-atom cubic cell whose cutoff spans TWO lattice images
in every direction (exercises multi-image periodic edges). Edges and images
come from this framework's ``set_range_periodic`` — the same convention the
reference datasets use (certified by the existing schnet_crystal/cgcnn
goldens: image shifts the SENDER, d = x_i - (x_j + s @ L)).

Fixtures: tests/assets/ref_golden_{painn,megnet,nmpn}_crystal.npz
Usage: TF_USE_LEGACY_KERAS=1 python -O tools/record_crystal_goldens.py
"""
from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, "/root/reference")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

ASSETS = os.path.join(os.path.dirname(__file__), "..", "tests", "assets")


def structures():
    from gcnn_keras_tpu.graph.preprocess import set_range_periodic

    cells = [
        # NaCl rocksalt conventional cell (8 atoms, a=5.64)
        dict(z=np.array([11, 11, 11, 11, 17, 17, 17, 17]),
             frac=np.array([[0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5],
                            [0, 0.5, 0.5], [0.5, 0, 0], [0, 0.5, 0],
                            [0, 0, 0.5], [0.5, 0.5, 0.5]], dtype=np.float64),
             lattice=np.eye(3) * 5.64, cutoff=4.0),
        # triclinic 3-atom cell
        dict(z=np.array([14, 8, 8]),
             frac=np.array([[0.1, 0.05, 0.02], [0.45, 0.3, 0.25],
                            [0.7, 0.75, 0.6]], dtype=np.float64),
             lattice=np.array([[4.2, 0.0, 0.0], [1.1, 3.9, 0.0],
                               [0.6, 0.8, 4.4]]), cutoff=4.5),
        # 1-atom cubic cell, cutoff > 2a: >=2 images in every direction
        dict(z=np.array([26]),
             frac=np.zeros((1, 3)),
             lattice=np.eye(3) * 2.4, cutoff=5.0),
    ]
    # r3 (VERDICT r2 item 5): a LARGER periodic cell — 2x2x2 NaCl supercell,
    # 64 atoms, same physics as cell 0 so the recorded energies also provide
    # an extensivity cross-check
    base = cells[0]
    shifts = np.array([[i, j, k] for i in (0, 1) for j in (0, 1)
                       for k in (0, 1)], dtype=np.float64)
    sup_frac = ((base["frac"][None, :, :] + shifts[:, None, :]) / 2.0
                ).reshape(-1, 3)
    cells.append(dict(z=np.tile(base["z"], 8),
                      frac=sup_frac,
                      lattice=base["lattice"] * 2.0, cutoff=4.0))
    graphs = []
    for c in cells:
        xyz = c["frac"] @ c["lattice"]
        g = {"node_coordinates": xyz.astype(np.float32),
             "graph_lattice": c["lattice"].astype(np.float32)}
        g = set_range_periodic(g, max_distance=c["cutoff"], backend="numpy")
        img = g["range_image"].astype(np.int64)
        graphs.append({
            "z": c["z"].astype(np.int64),
            "xyz": xyz.astype(np.float32),
            "lattice": c["lattice"].astype(np.float32),
            "edge_indices": g["range_indices"].astype(np.int64),
            "edge_image": img,
            "graph_attributes": np.zeros((1,), dtype=np.float32),
        })
        n_multi = int(np.sum(np.abs(img) >= 2))
        print(f"  cell z={c['z'].tolist()[:4]}..: {len(img)} edges, "
              f"{n_multi} entries with |image|>=2")
    assert any(np.any(np.abs(g["edge_image"]) >= 2) for g in graphs), \
        ">=2-image coverage requirement not met"
    return graphs


def _rag(vals, inner=None, dtype=None):
    import tensorflow as tf
    kw = {"ragged_rank": 1}
    if inner is not None:
        kw["inner_shape"] = inner
    if dtype is not None:
        kw["dtype"] = dtype
    return tf.ragged.constant(vals, **kw)


def base_inputs(graphs):
    import tensorflow as tf
    z = _rag([g["z"].astype(np.float32) for g in graphs])
    xyz = _rag([g["xyz"] for g in graphs], inner=(3,))
    ei = _rag([g["edge_indices"] for g in graphs], inner=(2,), dtype="int64")
    img = _rag([g["edge_image"].astype(np.float32) for g in graphs],
               inner=(3,))
    lat = tf.constant(np.stack([g["lattice"] for g in graphs]))
    return z, xyz, ei, img, lat


def save_golden(name, model, graphs, out):
    payload = {}
    for i, g in enumerate(graphs):
        for k, v in g.items():
            payload[f"g{i}_{k}"] = v
    payload["n_graphs"] = np.array(len(graphs))
    for wi, w in enumerate(model.weights):
        payload[f"w{wi:03d}"] = w.numpy()
        payload[f"wname{wi:03d}"] = np.array(w.name)
    payload["out0"] = np.asarray(out)
    path = os.path.join(ASSETS, f"ref_golden_{name}.npz")
    np.savez(path, **payload)
    print(f"saved {path}: {len(model.weights)} weights, "
          f"out {np.asarray(out).shape}")


def record_painn_crystal(graphs):
    import tensorflow as tf
    from kgcnn.literature.PAiNN import make_crystal_model
    tf.keras.utils.set_random_seed(41)
    model = make_crystal_model(depth=2)
    z, xyz, ei, img, lat = base_inputs(graphs)
    out = model([z, xyz, ei, img, lat], training=False)
    save_golden("painn_crystal", model, graphs, out)


def record_megnet_crystal(graphs):
    import tensorflow as tf
    from kgcnn.literature.Megnet import make_crystal_model
    tf.keras.utils.set_random_seed(43)
    model = make_crystal_model(nblocks=1)
    z, xyz, ei, img, lat = base_inputs(graphs)
    state = tf.constant(np.stack([g["graph_attributes"] for g in graphs]))
    out = model([z, xyz, ei, state, img, lat], training=False)
    save_golden("megnet_crystal", model, graphs, out)


def record_nmpn_crystal(graphs):
    import tensorflow as tf
    from kgcnn.literature.NMPN import make_crystal_model
    tf.keras.utils.set_random_seed(47)
    model = make_crystal_model(
        depth=2, geometric_edge=True, make_distance=True,
        expand_distance=True,
        inputs=[
            {"shape": [None], "name": "node_attributes", "dtype": "float32",
             "ragged": True},
            {"shape": [None, 3], "name": "node_coordinates",
             "dtype": "float32", "ragged": True},
            {"shape": [None, 2], "name": "edge_indices", "dtype": "int64",
             "ragged": True},
            {"shape": [None, 3], "name": "edge_image", "dtype": "float32",
             "ragged": True},
            {"shape": [3, 3], "name": "graph_lattice", "dtype": "float32",
             "ragged": False}],
        output_mlp={"units": [25, 10, 1],
                    "activation": ["selu", "selu", "sigmoid"],
                    "use_bias": [True, True, False]})
    z, xyz, ei, img, lat = base_inputs(graphs)
    out = model([z, xyz, ei, img, lat], training=False)
    save_golden("nmpn_crystal", model, graphs, out)


if __name__ == "__main__":
    import tensorflow as tf
    tf.config.set_visible_devices([], "GPU")
    graphs = structures()
    failed = []
    for fn in (record_painn_crystal, record_megnet_crystal,
               record_nmpn_crystal):
        try:
            fn(graphs)
        except Exception:
            import traceback
            print(f"--- {fn.__name__} failed:")
            traceback.print_exc(limit=8)
            failed.append(fn.__name__)
    if failed:
        sys.exit(f"FAILED: {failed}")
