"""Showcase: the flagship 4th-generation HDNNP end to end.

The tpu-native counterpart of the reference's ``showcase_hdnnp4th.ipynb``:
build a dataset, train the charge+energy+force model for a few epochs,
predict charges/energies/forces, verify the physics (charge conservation,
translation-invariant forces), and run on-device molecular dynamics with
the trained potential.

Runs on CPU in ~a minute (`JAX_PLATFORMS=cpu python
examples/showcase_hdnnp4th.py`); on a TPU the same script trains the real
thing.
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gcnn_keras_tpu.utils.devices import honor_platform_env

honor_platform_env()

import jax                                                      # noqa: E402
import jax.numpy as jnp                                         # noqa: E402
import optax                                                    # noqa: E402

# ----------------------------------------------------------- 1. dataset --
# Real runs load extxyz/pickle via prepare_data.py; offline we synthesize
# MD-like frames with charges and an external ESP (the QM/MM coupling).
from gcnn_keras_tpu.data.datasets.synthetic import SyntheticMDDataset  # noqa: E402

ds = SyntheticMDDataset(num_frames=24, seed=0)
rs = np.random.RandomState(0)
for g in ds:
    n = len(g["node_number"])
    g["node_number"] = np.asarray(
        [z if z in (1, 6, 16) else 1 for z in g["node_number"]], np.int64)
    g["charge"] = (rs.randn(n) * 0.1).astype(np.float32)
    g["esp"] = (rs.randn(n) * 0.01).astype(np.float32)
    g["esp_grad"] = (rs.randn(n, 3) * 0.01).astype(np.float32)
    g["total_charge"] = np.array([g["charge"].sum()], np.float32)
ds.map_list("set_range", max_distance=6.0, max_neighbours=12)
ds.map_list("set_angle")          # ACSF G4 needs angle triples
for g in ds:
    g["edge_indices"] = g["range_indices"]
print(f"dataset: {len(ds)} frames, "
      f"{len(ds[0]['node_number'])} atoms each")

# ------------------------------------------------------------- 2. model --
# ACSF G2+G4 descriptors -> relational MLPs -> Qeq charge equilibration ->
# electrostatics + QM/MM ESP coupling; EnergyForceModel adds forces as
# -dE/dR in one reverse pass (and the ESP force coupling).
from gcnn_keras_tpu.models.hdnnp4th import make_model_behler     # noqa: E402
from gcnn_keras_tpu.model.force import EnergyForceModel          # noqa: E402

elements = [1, 6, 16]
model = make_model_behler(
    g2_kwargs={"eta": [0.0, 0.3], "rs": [0.0, 3.0], "rc": 6.0,
               "elements": elements},
    g4_kwargs={"eta": [0.0, 0.3], "lamda": [-1.0, 1.0],
               "zeta": [1.0, 8.0], "rc": 6.0, "elements": elements,
               "multiplicity": 2.0},
    mlp_charge_kwargs={"units": [32, 32, 1], "num_relations": 17,
                       "activation": ["swish", "swish", "linear"]},
    mlp_local_kwargs={"units": [32, 32, 1], "num_relations": 17,
                      "activation": ["swish", "swish", "linear"]})
fmodel = EnergyForceModel(model, use_esp_coupling=True)

# ---------------------------------------------------------- 3. training --
from gcnn_keras_tpu.data.loader import GraphBatchLoader          # noqa: E402
from gcnn_keras_tpu.data.scalers import (                        # noqa: E402
    EnergyForceExtensiveLabelScaler)
from gcnn_keras_tpu.training.losses import (masked_graph_mae,    # noqa: E402
                                            masked_node_mae)
from gcnn_keras_tpu.training.trainer import Trainer              # noqa: E402

scaler = EnergyForceExtensiveLabelScaler()
scaler.fit_dataset(ds)
scaler.transform_dataset(ds)

hint = ds.batch_shape_hint(8)
loader = GraphBatchLoader(list(ds), 8, shuffle=True, seed=0,
                          global_keys=("energy", "total_charge"), **hint)
first = next(iter(loader))
# jit the init: an EAGER flax init on a tunneled TPU dispatches every op
# separately (minutes); jitted it is one launch
params = jax.jit(lambda k, b: fmodel.init(k, b, train=False))(
    jax.random.PRNGKey(0), first)


def loss_fn(p, b):
    out = fmodel.apply(p, b, train=False)
    lq = masked_node_mae(out["charge"], b.nodes["charge"], b.node_mask)
    le = masked_graph_mae(out["energy"], b.globals["energy"],
                          b.globals["graph_mask"])
    lf = masked_node_mae(out["force"], b.nodes["force"], b.node_mask)
    # the reference's normalized 50/1/200 weighting
    return (50.0 * lq + le + 200.0 * lf) / 251.0, {
        "charge_mae": lq, "energy_mae": le, "force_mae": lf}


trainer = Trainer(loss_fn, optax.adam(1e-3))
state = trainer.init_state(params)
for epoch in range(3):
    state, metrics = trainer.fit_epoch(state, loader)
    print(f"epoch {epoch}: loss={metrics['loss']:.4f} "
          f"F_mae={metrics['force_mae']:.4f} "
          f"q_mae={metrics['charge_mae']:.4f}")

# --------------------------------------------- 4. predict + physics check --
batch = ds.to_batch(global_keys=("energy", "total_charge"))
out = fmodel.apply(state.params, batch, train=False)
nm = np.asarray(batch.node_mask, bool)
gm = np.asarray(batch.globals["graph_mask"], bool)
charges = np.asarray(out["charge"]).reshape(-1)
gid = np.asarray(batch.graph_id)

# Qeq charge conservation: per-molecule charges sum to total_charge
for gi in np.nonzero(gm)[0][:3]:
    q_sum = charges[(gid == gi) & nm].sum()
    tgt = float(np.asarray(batch.globals["total_charge"]).reshape(-1)[gi])
    assert abs(q_sum - tgt) < 1e-3, (q_sum, tgt)
print("charge conservation ok: per-molecule charges sum to total_charge")

# translation invariance: the INTERNAL forces sum to ~0 per molecule.
# With use_esp_coupling the external QM/MM field exerts a real net force
# (~ sum q * esp_grad), so the tolerance covers that external term.
forces = np.asarray(out["force"])
esp_grad = np.asarray(batch.nodes["esp_grad"])
for gi in np.nonzero(gm)[0][:3]:
    sel = (gid == gi) & nm
    f_net = forces[sel].sum(axis=0)
    f_ext = np.abs(charges[sel][:, None] * esp_grad[sel]).sum()
    assert np.all(np.abs(f_net) < 1e-3 + 2.0 * f_ext), (f_net, f_ext)
print("force translation invariance ok: net force ~ external-field force")

# ----------------------------------------------- 5. on-device MD (bonus) --
# The reference drives MD through ASE's python loop (one host round trip
# per step); ScannedMD runs whole segments on-device (PERF.md: ~260x lower
# per-step latency through a tunneled chip).
from gcnn_keras_tpu.moldyn.trajectory import ScannedMD           # noqa: E402

z0 = np.asarray(ds[0]["node_number"])
pos0 = np.asarray(ds[0]["node_coordinates"], np.float32)
extras = {"total_charge": np.asarray(ds[0]["total_charge"], np.float32),
          "esp": np.asarray(ds[0]["esp"], np.float32),
          "esp_grad": np.asarray(ds[0]["esp_grad"], np.float32)}
md = ScannedMD(fmodel.energy_model, state.params, dt=2e-4,
               segment_steps=25, max_distance=6.0, max_neighbours=12,
               with_angles=True, graph_extras=extras,
               global_keys=("total_charge",))
traj = md.run(z0, pos0, n_segments=2)
e0, e1 = float(traj["e_pot"][0]), float(traj["e_pot"][-1])
assert np.isfinite(traj["e_pot"]).all()
print(f"MD: 50 steps on-device, E_pot {e0:.4f} -> {e1:.4f}")
print("showcase complete")
