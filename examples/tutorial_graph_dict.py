"""Tutorial: GraphDict, preprocessors and the flat-batch invariant.

Counterpart of the reference's ``notebooks/tutorial_graph_dict.ipynb``:
how a molecule becomes a graph, what the preprocessors add, and how
``batch_graphs`` packs many molecules into ONE statically-shaped disjoint
batch (the representation every model and kernel in this framework
assumes).

Run: JAX_PLATFORMS=cpu python examples/tutorial_graph_dict.py
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gcnn_keras_tpu.utils.devices import honor_platform_env

honor_platform_env()

# 1. A graph is a plain dict of numpy arrays (the reference's GraphDict).
water = {
    "node_number": np.array([8, 1, 1], dtype=np.int64),
    "node_coordinates": np.array(
        [[0.0, 0.0, 0.0], [0.96, 0.0, 0.0], [-0.24, 0.93, 0.0]],
        dtype=np.float32),
}

# 2. Preprocessors are dict -> dict callables (graph/preprocess.py — the
# reference's set_range/set_angle preprocessor classes as functions).
from gcnn_keras_tpu.graph.preprocess import set_range, set_angle

water = set_range(water, max_distance=2.0, max_neighbours=4)
print("range_indices (receiver, sender):")
print(water["range_indices"])
water["edge_indices"] = water.pop("range_indices")
water = set_angle(water, range_indices="edge_indices")
print("angle triples (i center, j, k):", water["angle_indices_nodes"].shape)

# 3. Many molecules -> ONE flat disjoint padded batch. THE invariants
# every layer relies on (gcnn_keras_tpu/batch.py): edges sorted by
# receiver, padding nodes in the last graph slot, padding edges pointing
# at the dead last node.
from gcnn_keras_tpu.batch import batch_graphs

methane = {
    "node_number": np.array([6, 1, 1, 1, 1], dtype=np.int64),
    "node_coordinates": (np.random.RandomState(0).randn(5, 3) * 0.6
                         ).astype(np.float32),
}
methane = set_range(methane, max_distance=2.5, max_neighbours=4)
methane["edge_indices"] = methane.pop("range_indices")
methane = set_angle(methane, range_indices="edge_indices")

batch = batch_graphs([water, methane], n_node_pad=16, n_edge_pad=32,
                     n_angle_pad=128)
print(f"batch: {batch.n_graphs} graph slots, {batch.n_node} node slots, "
      f"{batch.senders.shape[0]} edge slots")
print("receivers are sorted:",
      bool(np.all(np.diff(np.asarray(batch.receivers)) >= 0)))
print("real nodes:", int(np.asarray(batch.node_mask).sum()),
      "real edges:", int(np.asarray(batch.edge_mask).sum()))

# 4. Padding must never change real outputs — models are padding-invariant
# by construction. Demonstrate with a SchNet energy:
import jax
from gcnn_keras_tpu.models.schnet import make_model

model = make_model(depth=1, interaction_args={"units": 16},
                   gauss_args={"bins": 8, "distance_max": 4.0},
                   last_mlp={"units": [8],
                             "activation": ["shifted_softplus"]},
                   output_mlp={"units": [1], "activation": ["linear"]})
params = model.init(jax.random.PRNGKey(0), batch)
out_a = model.apply(params, batch)["output"]

bigger = batch_graphs([water, methane], n_node_pad=64, n_edge_pad=128,
                      n_angle_pad=128)
out_b = model.apply(params, bigger)["output"]
np.testing.assert_allclose(np.asarray(out_a)[:2], np.asarray(out_b)[:2],
                           rtol=1e-5)
print("padding invariance ok: energies identical at both padded shapes")
print("tutorial complete")
