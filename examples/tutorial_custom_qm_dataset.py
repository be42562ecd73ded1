"""Tutorial: building a custom QM dataset from xyz files + label table.

Counterpart of the reference's ``notebooks/tutorial_custom_qm_dataset``:
write a multi-molecule .xyz + labels, read it through the QMDataset
machinery, attach neighbor lists, and train-predict a property model.

Run: JAX_PLATFORMS=cpu python examples/tutorial_custom_qm_dataset.py
"""
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gcnn_keras_tpu.utils.devices import honor_platform_env

honor_platform_env()

# 1. Your data: one .xyz with all geometries + an aligned label array.
SYMBOLS = {1: "H", 6: "C", 8: "O"}
rs = np.random.RandomState(0)
frames = []
for i in range(12):
    n = rs.randint(3, 7)
    z = rs.choice([1, 6, 8], size=n)
    xyz = rs.randn(n, 3) * 1.2
    frames.append((z, xyz))

tmp = tempfile.mkdtemp(prefix="qm_tutorial_")
xyz_path = os.path.join(tmp, "molecules.xyz")
with open(xyz_path, "w") as f:
    for z, xyz in frames:
        f.write(f"{len(z)}\ncomment\n")
        for zi, row in zip(z, xyz):
            f.write(f"{SYMBOLS[zi]} {row[0]:.6f} {row[1]:.6f} {row[2]:.6f}\n")
labels = rs.randn(len(frames), 1).astype(np.float32)

# 2. QMDataset reads it (mol/io.py xyz reader under the hood).
from gcnn_keras_tpu.data.datasets.qm import QMDataset

ds = QMDataset(data_directory=tmp, dataset_name="MyQM")
ds.read_in_memory_xyz(xyz_path, label_array=labels)
ds.set_range(max_distance=3.0, max_neighbours=6)
for g in ds:
    g["edge_indices"] = g["range_indices"]
print(f"dataset: {len(ds)} molecules; first has "
      f"{len(ds[0]['node_number'])} atoms, "
      f"{len(ds[0]['edge_indices'])} edges")

# 3. Straight into a model: batch + GCN-style property regression.
import jax
import jax.numpy as jnp
import optax
from gcnn_keras_tpu.data.loader import GraphBatchLoader
from gcnn_keras_tpu.models.schnet import make_model
from gcnn_keras_tpu.training.losses import masked_graph_mae
from gcnn_keras_tpu.training.trainer import Trainer

for g in ds:
    g["graph_labels"] = np.atleast_1d(g["graph_labels"])
hint = ds.batch_shape_hint(6)
loader = GraphBatchLoader(list(ds), 6, shuffle=True, seed=0,
                          global_keys=("graph_labels",), **hint)
model = make_model(depth=1, interaction_args={"units": 16},
                   gauss_args={"bins": 8, "distance_max": 3.0},
                   last_mlp={"units": [8],
                             "activation": ["shifted_softplus"]},
                   output_mlp={"units": [1], "activation": ["linear"]})
first = next(iter(loader))
params = model.init(jax.random.PRNGKey(0), first)


def loss_fn(p, b):
    out = model.apply(p, b)["output"]
    loss = masked_graph_mae(out, b.globals["graph_labels"],
                            b.globals["graph_mask"])
    return loss, {}


trainer = Trainer(loss_fn, optax.adam(1e-2))
state = trainer.init_state(params)
for epoch in range(3):
    state, metrics = trainer.fit_epoch(state, loader)
    print(f"epoch {epoch}: mae={metrics['loss']:.4f}")

pred = model.apply(state.params, ds.to_batch(
    global_keys=("graph_labels",)))["output"]
assert np.isfinite(np.asarray(pred)).all()
print("predictions finite; tutorial complete")
