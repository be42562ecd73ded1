"""Record force-path goldens from the reference EnergyForceModel.

Wraps the reference energy models (SchNet, PAiNN, HDNNP2nd, HDNNP4th) in the
reference ``EnergyForceModel`` (``/root/reference/kgcnn/model/force.py:136-201``)
with the fork's exact wrapper config (``force_*.py``: ``output_as_dict=False``,
``output_squeeze_states=True``, ``is_physical_force=False``; HDNNP4th
additionally ``esp_input=5, esp_grad_input=6`` exercising the ESP-gradient
coupling branch ``force.py:179-183``) and records inputs, all weights and the
energy/force(/charge) outputs on SIX molecules of 3-14 atoms (multi-element
angular diversity: H2O, CH4, methanol, ethanol, benzene, glycerol).

Fixtures land in ``tests/assets/ref_force_<model>.npz`` and are consumed by
``tests/test_force_parity.py``.

Usage (asserts in the reference HDNNP model builders dereference a missing
'elemental_mapping' key, so run with -O):

    TF_USE_LEGACY_KERAS=1 python -O tools/record_force_goldens.py
"""
from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, "/root/reference")

ASSETS = os.path.join(os.path.dirname(__file__), "..", "tests", "assets")

ELEMENTS = [1, 6, 8]


def molecules():
    """Six molecules, 3-14 atoms, elements {H, C, O}."""
    mols = [
        # H2O (3)
        (np.array([8, 1, 1]),
         [[0.0, 0.0, 0.0], [0.9572, 0.0, 0.0], [-0.2399872, 0.92662721, 0.0]]),
        # CH4 (5)
        (np.array([6, 1, 1, 1, 1]),
         [[0.0, 0.0, 0.0], [0.6291, 0.6291, 0.6291],
          [-0.6291, -0.6291, 0.6291], [-0.6291, 0.6291, -0.6291],
          [0.6291, -0.6291, -0.6291]]),
        # methanol CH3OH (6)
        (np.array([6, 8, 1, 1, 1, 1]),
         [[0.0, 0.0, 0.0], [1.43, 0.0, 0.0], [1.76, 0.90, 0.0],
          [-0.36, -1.03, 0.0], [-0.36, 0.51, 0.89], [-0.36, 0.51, -0.89]]),
        # ethanol C2H5OH (9)
        (np.array([6, 6, 8, 1, 1, 1, 1, 1, 1]),
         [[0.0, 0.0, 0.0], [1.51, 0.0, 0.0], [2.04, 1.33, 0.0],
          [3.00, 1.28, 0.0], [-0.39, -0.51, 0.89], [-0.39, -0.51, -0.89],
          [-0.39, 1.02, 0.0], [1.90, -0.52, 0.88], [1.90, -0.52, -0.88]]),
        # benzene C6H6 (12): planar hexagon, C r=1.397, H r=2.481
        (np.array([6] * 6 + [1] * 6),
         [[1.397 * np.cos(k * np.pi / 3), 1.397 * np.sin(k * np.pi / 3), 0.0]
          for k in range(6)] +
         [[2.481 * np.cos(k * np.pi / 3), 2.481 * np.sin(k * np.pi / 3), 0.0]
          for k in range(6)]),
        # glycerol C3H8O3 (14)
        (np.array([6, 6, 6, 8, 8, 8, 1, 1, 1, 1, 1, 1, 1, 1]),
         [[0.000, 0.000, 0.000], [1.530, 0.000, 0.000],
          [2.060, 1.435, 0.000], [-0.520, 1.280, 0.250],
          [1.980, -0.680, 1.190], [3.480, 1.430, 0.050],
          [-0.380, -0.530, 0.900], [-0.380, -0.520, -0.900],
          [1.900, -0.560, -0.880], [1.700, 1.960, 0.880],
          [1.700, 1.950, -0.890], [-1.480, 1.210, 0.230],
          [2.930, -0.690, 1.180], [3.830, 2.320, 0.060]]),
    ]
    from kgcnn.graph.adj import get_angle_indices
    # r3 (VERDICT r2 item 5): extend past 17 atoms — 21-atom aspirin (the
    # MD17 molecule the BASELINE table quotes) and a 50-atom alkane chain
    from golden_molecules import alkane_chain, aspirin
    mols.append(tuple(aspirin()))
    mols.append(tuple(alkane_chain(16)))
    rs = np.random.RandomState(101)
    graphs = []
    for z, xyz in mols:
        z = z.astype(np.int64)
        # Tiny deterministic jitter breaks exact point-group symmetry:
        # on perfectly-symmetric CH4 the reference PAiNN's equivariant
        # features cancel to exactly zero on the central atom, and
        # d(norm)/dv at v=0 NaNs the reference's batch_jacobian forces
        # (our framework stays finite there, see test_force_parity).
        xyz = np.asarray(xyz, dtype=np.float32)
        xyz = xyz + (rs.randn(*xyz.shape) * 0.02).astype(np.float32)
        n = len(z)
        ei = np.array([[i, j] for i in range(n) for j in range(n) if i != j],
                      dtype=np.int64)
        _, triples, _ = get_angle_indices(ei)
        graphs.append({
            "z": z, "xyz": xyz, "edge_indices": ei,
            "angle_indices_nodes": triples.astype(np.int64),
            "esp": (rs.randn(n) * 0.02).astype(np.float32),
            "esp_grad": (rs.randn(n, 3) * 0.02).astype(np.float32),
            "total_charge": np.zeros((1,), dtype=np.float32),
        })
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
    z = _rag([g["z"].astype(np.float32) for g in graphs])
    xyz = _rag([g["xyz"] for g in graphs], inner=(3,))
    ei = _rag([g["edge_indices"] for g in graphs], inner=(2,), dtype="int64")
    return z, xyz, ei


def save_force_golden(name, model, graphs, outs):
    payload = {}
    for i, g in enumerate(graphs):
        for k, v in g.items():
            payload[f"g{i}_{k}"] = v
    payload["n_graphs"] = np.array(len(graphs))
    for wi, w in enumerate(model.weights):
        payload[f"w{wi:03d}"] = w.numpy()
        payload[f"wname{wi:03d}"] = np.array(w.name)
    for oi, o in enumerate(outs):
        payload[f"out{oi}"] = np.asarray(o)
    path = os.path.join(ASSETS, f"ref_force_{name}.npz")
    np.savez(path, **payload)
    shapes = [np.asarray(o).shape for o in outs]
    print(f"saved {path}: {len(model.weights)} weights, outs {shapes}")


def wrap_force(model_energy, energy_output=0, esp=False):
    from kgcnn.model.force import EnergyForceModel
    kw = dict(model_energy=model_energy, energy_output=energy_output,
              output_to_tensor=True, output_as_dict=False,
              output_squeeze_states=True, is_physical_force=False)
    if esp:
        kw.update(esp_input=5, esp_grad_input=6)
    return EnergyForceModel(**kw)


def record_schnet():
    import tensorflow as tf
    from kgcnn.literature.Schnet import make_model
    tf.keras.utils.set_random_seed(7)
    model = make_model(depth=2)
    graphs = molecules()
    fmodel = wrap_force(model, energy_output=0)
    eng, force = fmodel(list(base_inputs(graphs)), training=False)
    save_force_golden("schnet", model, graphs, [eng, force])


def record_painn():
    import tensorflow as tf
    from kgcnn.literature.PAiNN import make_model
    tf.keras.utils.set_random_seed(11)
    model = make_model(depth=2)
    graphs = molecules()
    fmodel = wrap_force(model, energy_output=0)
    eng, force = fmodel(list(base_inputs(graphs)), training=False)
    save_force_golden("painn", model, graphs, [eng, force])


HDNNP_KW = dict(
    g2_kwargs={"eta": [0.0, 0.3], "rs": [0.0, 3.0], "rc": 10.0,
               "elements": ELEMENTS},
    g4_kwargs={"eta": [0.0, 0.3], "lamda": [-1.0, 1.0], "rc": 6.0,
               "zeta": [1.0, 8.0], "elements": ELEMENTS,
               "multiplicity": 2.0},
    normalize_kwargs={},
)


def record_hdnnp2nd():
    import tensorflow as tf
    from kgcnn.literature.HDNNP2nd import make_model_behler
    tf.keras.utils.set_random_seed(23)
    model = make_model_behler(
        mlp_kwargs={"units": [32, 32, 1], "num_relations": 9,
                    "activation": ["swish", "swish", "linear"]},
        **HDNNP_KW)
    graphs = molecules()
    z, xyz, ei = base_inputs(graphs)
    ai = _rag([g["angle_indices_nodes"] for g in graphs], inner=(3,),
              dtype="int64")
    fmodel = wrap_force(model, energy_output=0)
    eng, force = fmodel([z, xyz, ei, ai], training=False)
    save_force_golden("hdnnp2nd", model, graphs, [eng, force])


def record_hdnnp4th():
    import tensorflow as tf
    from kgcnn.literature.HDNNP4th import make_model_behler
    tf.keras.utils.set_random_seed(31)
    model = make_model_behler(
        inputs=[
            {"shape": (None,), "name": "node_number", "dtype": "int64",
             "ragged": True},
            {"shape": (None, 3), "name": "node_coordinates",
             "dtype": "float32", "ragged": True},
            {"shape": (None, 2), "name": "range_indices", "dtype": "int64",
             "ragged": True},
            {"shape": (None, 3), "name": "angle_indices_nodes",
             "dtype": "int64", "ragged": True},
            {"shape": (1,), "name": "total_charge", "dtype": "float32",
             "ragged": False},
            {"shape": (None,), "name": "esp", "dtype": "float32",
             "ragged": True},
            {"shape": (None, 3), "name": "esp_grad", "dtype": "float32",
             "ragged": True}],
        mlp_charge_kwargs={"units": [32, 32, 1], "num_relations": 9,
                           "activation": ["swish", "swish", "linear"]},
        mlp_local_kwargs={"units": [32, 32, 1], "num_relations": 9,
                          "activation": ["swish", "swish", "linear"]},
        output_embedding="charge+qm_energy",
        **HDNNP_KW)
    graphs = molecules()
    z, xyz, ei = base_inputs(graphs)
    ai = _rag([g["angle_indices_nodes"] for g in graphs], inner=(3,),
              dtype="int64")
    qtot = tf.constant(np.stack([g["total_charge"] for g in graphs]))
    esp = _rag([g["esp"] for g in graphs])
    espg = _rag([g["esp_grad"] for g in graphs], inner=(3,))
    fmodel = wrap_force(model, energy_output=1, esp=True)
    charge, eng, force = fmodel([z, xyz, ei, ai, qtot, esp, espg],
                                training=False)
    save_force_golden("hdnnp4th", model, graphs, [charge, eng, force])


if __name__ == "__main__":
    import tensorflow as tf
    tf.config.set_visible_devices([], "GPU")
    failed = []
    only = os.environ.get("RECORD_ONLY")
    fns = [record_schnet, record_painn, record_hdnnp2nd, record_hdnnp4th]
    if only:
        fns = [globals()[f"record_{n}"] for n in only.split(",")]
    for fn in fns:
        try:
            fn()
        except Exception:
            import traceback
            print(f"--- {fn.__name__} failed:")
            traceback.print_exc(limit=8)
            failed.append(fn.__name__)
    if failed:
        sys.exit(f"FAILED: {failed}")
