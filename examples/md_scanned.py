"""Scanned on-device MD with ScannedMD: single molecule and a replica
ensemble, NVE and Langevin NVT.

Host-loop MD (e.g. driving the ASE calculator, examples/md_with_ase.py)
pays one model dispatch per step; ScannedMD runs whole segments inside one
jitted lax.scan and re-neighbors on the host between segments — measured
~283 us/step wall for one 21-atom molecule and 12.95 us/replica-step for a
64-replica ensemble on a v5e (PERF.md r3).

Run (CPU): python examples/md_scanned.py
Run (TPU): just run it under the axon platform; first segment compiles.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_molecule(n, seed):
    rs = np.random.RandomState(seed)
    t = np.arange(n) * 1.2
    pos = np.stack([t, 1.5 * np.sin(t * 0.9), 1.5 * np.cos(t * 0.7)], axis=1)
    return {"node_number": rs.choice([1, 6, 7, 8], size=n),
            "node_coordinates": (pos + rs.randn(n, 3) * 0.1).astype(np.float32)}


def main():
    import jax
    from gcnn_keras_tpu.batch import batch_graphs
    from gcnn_keras_tpu.graph.preprocess import set_range
    from gcnn_keras_tpu.models.schnet import make_model
    from gcnn_keras_tpu.moldyn import ScannedMD

    # build + init the potential (random params here; load trained ones via
    # utils/checkpoint in real use)
    mol = make_molecule(21, seed=0)
    g = dict(mol, energy=np.array([0.0], np.float32))
    g = set_range(g, max_distance=4.0, max_neighbours=25)
    g["edge_indices"] = g.pop("range_indices")
    model = make_model()
    params = model.init(jax.random.PRNGKey(0),
                        batch_graphs([g], global_keys=("energy",)))

    # --- single-molecule NVE ------------------------------------------------
    md = ScannedMD(model, params, dt=5e-4, segment_steps=200)
    t0 = time.perf_counter()
    out = md.run(mol["node_number"], mol["node_coordinates"], n_segments=5)
    wall = time.perf_counter() - t0
    e_tot = out["e_pot"] + out["e_kin"]
    print(f"NVE: 1000 steps in {wall:.2f}s "
          f"({wall / 1000 * 1e6:.0f} us/step incl. compile), "
          f"|dE| max {np.abs(e_tot - e_tot[0]).max():.2e}, "
          f"{out['n_shapes_compiled']} shape(s) compiled")

    # --- Langevin NVT -------------------------------------------------------
    md_nvt = ScannedMD(model, params, dt=5e-4, segment_steps=200,
                       thermostat="langevin", kT=0.02, friction=20.0)
    out = md_nvt.run(mol["node_number"], mol["node_coordinates"],
                     n_segments=5)
    print(f"NVT: <E_kin> over last segment = {out['e_kin'][-200:].mean():.4f} "
          f"(target dof/2*kT = {1.5 * 21 * 0.02:.4f})")

    # --- replica ensemble ---------------------------------------------------
    systems = [make_molecule(21, seed=s) for s in range(8)]
    md_ens = ScannedMD(model, params, dt=5e-4, segment_steps=200)
    t0 = time.perf_counter()
    out = md_ens.run_ensemble(systems, n_segments=3)
    wall = time.perf_counter() - t0
    print(f"ensemble: 8 replicas x 600 steps in {wall:.2f}s, "
          f"e_pot shape {out['e_pot'].shape}")


if __name__ == "__main__":
    main()
