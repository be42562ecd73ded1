"""Segmented scanned-MD driver (moldyn/trajectory.py) + Langevin BAOAB
integrator (moldyn/integrate.py): segment chaining must reproduce the
single-scan trajectory when topology is stable, re-neighboring must track
topology changes, and the thermostat must equilibrate kinetic energy to
the target kT."""
import numpy as np
import jax
import jax.numpy as jnp

from gcnn_keras_tpu.batch import batch_graphs
from gcnn_keras_tpu.graph.preprocess import set_range
from gcnn_keras_tpu.models.schnet import make_model
from gcnn_keras_tpu.moldyn.integrate import (velocity_verlet,
                                             make_energy_force_fn,
                                             langevin_baoab)
from gcnn_keras_tpu.moldyn.trajectory import ScannedMD
from gcnn_keras_tpu.utils.constants import masses_from_numbers


def _mol(n=13, seed=0):
    rs = np.random.RandomState(seed)
    t = np.arange(n) * 1.2
    pos = np.stack([t, 1.3 * np.sin(t), 1.3 * np.cos(t)], axis=1)
    pos = (pos + rs.randn(n, 3) * 0.05).astype(np.float32)
    return rs.choice([1, 6, 7, 8], size=n), pos


def test_scanned_md_matches_single_scan_when_topology_stable():
    """Two chained segments == one long scan, when re-neighboring finds the
    identical edge set (tiny dt, zero initial velocity)."""
    z, pos = _mol()
    model = make_model()
    g = {"node_number": z, "node_coordinates": pos,
         "energy": np.array([0.0], dtype=np.float32)}
    g = set_range(g, max_distance=4.0, max_neighbours=25)
    g["edge_indices"] = g.pop("range_indices")
    batch = batch_graphs([g], global_keys=("energy",))
    params = model.init(jax.random.PRNGKey(0), batch)

    masses = masses_from_numbers(z)
    m_pad = np.ones((batch.n_node,), np.float32)
    m_pad[: len(z)] = masses
    fn = make_energy_force_fn(model, params, batch)
    ref = velocity_verlet(fn, batch.nodes["node_coordinates"],
                          jnp.zeros((batch.n_node, 3), jnp.float32),
                          jnp.asarray(m_pad), dt=1e-3, steps=80,
                          node_mask=batch.node_mask)

    md = ScannedMD(model, params, dt=1e-3, segment_steps=40,
                   max_distance=4.0, max_neighbours=25)
    out = md.run(z, pos, n_segments=2)

    assert out["edge_counts"][0] == out["edge_counts"][1]
    np.testing.assert_allclose(out["pos"], np.asarray(ref["pos"])[: len(z)],
                               atol=1e-5)
    np.testing.assert_allclose(out["e_pot"], np.asarray(ref["e_pot"]),
                               atol=1e-5)
    # stable topology + stable bucketed shapes -> exactly one compilation
    assert out["n_shapes_compiled"] == 1


def test_scanned_md_reneighbors_moving_atoms():
    """Atoms flying apart change the neighbor list between segments; the
    driver must rebuild and keep the trajectory finite."""
    z = np.array([18, 18, 18, 18])
    pos = np.array([[0.0, 0, 0], [2.0, 0, 0], [0, 2.0, 0], [0, 0, 2.0]],
                   dtype=np.float32)
    vel = np.array([[-0.5, 0, 0], [0.5, 0, 0], [0, 0.5, 0], [0, 0, 0.5]],
                   dtype=np.float32)
    model = make_model()
    g = {"node_number": z, "node_coordinates": pos,
         "energy": np.array([0.0], dtype=np.float32)}
    g = set_range(g, max_distance=3.0, max_neighbours=10)
    g["edge_indices"] = g.pop("range_indices")
    batch = batch_graphs([g], global_keys=("energy",))
    params = model.init(jax.random.PRNGKey(1), batch)

    md = ScannedMD(model, params, dt=0.05, segment_steps=20,
                   max_distance=3.0, max_neighbours=10)
    out = md.run(z, pos, n_segments=4, velocities=vel)
    assert len(set(out["edge_counts"])) > 1  # topology actually changed
    assert np.isfinite(out["e_pot"]).all()
    assert np.isfinite(out["pos"]).all()


def test_langevin_thermostat_equilibrates_to_kT():
    """BAOAB on an isotropic harmonic well: <E_kin> -> (dof/2) kT."""
    n, kT = 4, 0.5
    pos0 = jnp.zeros((n, 3), jnp.float32)
    vel0 = jnp.zeros((n, 3), jnp.float32)
    masses = jnp.ones((n,), jnp.float32) * 2.0

    def ef(p):
        return 0.5 * jnp.sum(p * p), -p

    traj = langevin_baoab(ef, pos0, vel0, masses, dt=0.05, steps=6000,
                          kT=kT, friction=2.0, rng=jax.random.PRNGKey(0))
    ekin = np.asarray(traj["e_kin"])[3000:]
    target = 0.5 * (3 * n) * kT
    assert abs(float(ekin.mean()) - target) / target < 0.15
    # equipartition also fixes <E_pot> = (dof/2) kT for the harmonic well
    epot = np.asarray(traj["e_pot"])[3000:]
    assert abs(float(epot.mean()) - target) / target < 0.15


def test_scanned_md_langevin_runs_on_model():
    z, pos = _mol(n=8, seed=3)
    model = make_model()
    g = {"node_number": z, "node_coordinates": pos,
         "energy": np.array([0.0], dtype=np.float32)}
    g = set_range(g, max_distance=4.0, max_neighbours=25)
    g["edge_indices"] = g.pop("range_indices")
    batch = batch_graphs([g], global_keys=("energy",))
    params = model.init(jax.random.PRNGKey(2), batch)

    md = ScannedMD(model, params, dt=1e-3, segment_steps=25,
                   thermostat="langevin", kT=0.1, friction=5.0)
    out = md.run(z, pos, n_segments=2)
    assert np.isfinite(out["e_pot"]).all()
    assert float(out["e_kin"][-25:].mean()) > 0.0


def test_scanned_md_hdnnp4th_flagship():
    """The flagship HDNNP4th (ACSF angles + Qeq charge solve +
    electrostatics) runs inside the scanned segment — charges equilibrate
    on-device every MD step."""
    from gcnn_keras_tpu.graph.preprocess import set_angle
    from gcnn_keras_tpu.models.hdnnp4th import make_model_behler

    z, pos = _mol(n=7, seed=5)
    extras = {"total_charge": np.zeros((1,), np.float32),
              "esp": np.zeros((len(z),), np.float32),
              "esp_grad": np.zeros((len(z), 3), np.float32)}
    g = {"node_number": z, "node_coordinates": pos, **extras}
    g = set_range(g, max_distance=4.0, max_neighbours=25)
    g["edge_indices"] = g.pop("range_indices")
    g = set_angle(g, range_indices="edge_indices")
    batch = batch_graphs([g], global_keys=("total_charge",))

    model = make_model_behler(
        mlp_charge_kwargs={"units": [16, 1], "num_relations": 17,
                           "activation": ["swish", "linear"]},
        mlp_local_kwargs={"units": [16, 1], "num_relations": 17,
                          "activation": ["swish", "linear"]})
    params = model.init(jax.random.PRNGKey(0), batch)

    md = ScannedMD(model, params, dt=5e-4, segment_steps=15,
                   max_distance=4.0, with_angles=True,
                   graph_extras=extras, global_keys=("total_charge",))
    out = md.run(z, pos, n_segments=2)
    assert np.isfinite(out["e_pot"]).all()
    assert np.isfinite(out["pos"]).all()
    assert out["e_pot"].shape == (30,)


def test_scanned_md_ensemble_matches_independent_runs():
    """S replicas in one scanned segment == S independent trajectories
    (disjoint batching keeps forces exactly independent)."""
    model = make_model()
    systems, singles = [], []
    params = None
    for seed in range(3):
        z, pos = _mol(n=6 + seed, seed=seed)
        systems.append({"node_number": z, "node_coordinates": pos})
        singles.append((z, pos))
        if params is None:
            g = {"node_number": z, "node_coordinates": pos,
                 "energy": np.array([0.0], dtype=np.float32)}
            g = set_range(g, max_distance=4.0, max_neighbours=25)
            g["edge_indices"] = g.pop("range_indices")
            params = model.init(jax.random.PRNGKey(0),
                                batch_graphs([g], global_keys=("energy",)))

    md = ScannedMD(model, params, dt=1e-3, segment_steps=20)
    ens = md.run_ensemble(systems, n_segments=2)
    assert ens["e_pot"].shape == (40, 3)

    for i, (z, pos) in enumerate(singles):
        md1 = ScannedMD(model, params, dt=1e-3, segment_steps=20)
        out = md1.run(z, pos, n_segments=2)
        np.testing.assert_allclose(ens["pos"][i], out["pos"], atol=2e-5)
        np.testing.assert_allclose(ens["e_pot"][:, i], out["e_pot"],
                                   atol=2e-5)


def test_scanned_md_ensemble_sharded_matches_single_device():
    """Replica-DP over a 4-device mesh == single-device ensemble (no
    collectives; each device integrates its chunk of replicas)."""
    model = make_model()
    systems = []
    params = None
    for seed in range(8):
        z, pos = _mol(n=5 + (seed % 3), seed=10 + seed)
        systems.append({"node_number": z, "node_coordinates": pos})
        if params is None:
            g = {"node_number": z, "node_coordinates": pos,
                 "energy": np.array([0.0], dtype=np.float32)}
            g = set_range(g, max_distance=4.0, max_neighbours=25)
            g["edge_indices"] = g.pop("range_indices")
            params = model.init(jax.random.PRNGKey(0),
                                batch_graphs([g], global_keys=("energy",)))

    md1 = ScannedMD(model, params, dt=1e-3, segment_steps=15)
    ref = md1.run_ensemble(systems, n_segments=2)
    md4 = ScannedMD(model, params, dt=1e-3, segment_steps=15)
    out = md4.run_ensemble(systems, n_segments=2, n_devices=4)

    np.testing.assert_allclose(out["e_pot"], ref["e_pot"], atol=2e-5)
    for a, b in zip(out["pos"], ref["pos"]):
        np.testing.assert_allclose(a, b, atol=2e-5)


def test_scanned_md_periodic_crystal():
    """NVE in a fixed periodic cell: positions wrap into the cell at
    re-neighboring, the model's range_image path carries the shifts, and
    energy is invariant to pre-wrapped vs wrapped starting coordinates."""
    a = 5.64
    z = np.array([11, 17, 11, 17])
    frac = np.array([[0.0, 0, 0], [0.5, 0, 0], [0.0, 0.5, 0.5],
                     [0.5, 0.5, 0.5]], dtype=np.float32)
    lat = (np.eye(3) * a).astype(np.float32)
    pos = frac @ lat
    model = make_model()  # periodic support is implicit via range_image

    from gcnn_keras_tpu.graph.preprocess import set_range_periodic
    g = {"node_number": z, "node_coordinates": pos, "graph_lattice": lat,
         "energy": np.array([0.0], dtype=np.float32)}
    g = set_range_periodic(g, max_distance=4.0, max_neighbours=14)
    g["edge_indices"] = g.pop("range_indices")
    batch = batch_graphs([g], global_keys=("energy",))
    params = model.init(jax.random.PRNGKey(0), batch)
    e_direct = float(model.apply(params, batch)["output"][0, 0])

    md = ScannedMD(model, params, dt=1e-3, segment_steps=20,
                   max_distance=4.0, max_neighbours=14)
    sys0 = {"node_number": z, "node_coordinates": pos, "graph_lattice": lat}
    out = md.run_ensemble([sys0], n_segments=3)
    assert np.isfinite(out["e_pot"]).all()
    assert abs(out["e_pot"][0, 0] - e_direct) < 1e-4

    # same crystal with one atom translated by a full lattice vector:
    # wrapping must restore the identical initial energy
    pos2 = pos.copy()
    pos2[1] += lat[0] * 2.0
    md2 = ScannedMD(model, params, dt=1e-3, segment_steps=20,
                    max_distance=4.0, max_neighbours=14)
    out2 = md2.run_ensemble(
        [{"node_number": z, "node_coordinates": pos2,
          "graph_lattice": lat}], n_segments=1)
    assert abs(out2["e_pot"][0, 0] - out["e_pot"][0, 0]) < 1e-4


def test_scanned_md_painn():
    """ScannedMD is model-agnostic: PAiNN (equivariant features) integrates
    in the scanned segment too."""
    from gcnn_keras_tpu.models.painn import make_model as make_painn

    z, pos = _mol(n=6, seed=21)
    model = make_painn(depth=2, units=32)
    g = {"node_number": z, "node_coordinates": pos,
         "energy": np.array([0.0], dtype=np.float32)}
    g = set_range(g, max_distance=4.0, max_neighbours=25)
    g["edge_indices"] = g.pop("range_indices")
    batch = batch_graphs([g], global_keys=("energy",))
    params = model.init(jax.random.PRNGKey(0), batch)

    md = ScannedMD(model, params, dt=1e-3, segment_steps=20)
    out = md.run(z, pos, n_segments=2)
    assert np.isfinite(out["e_pot"]).all()
    e_tot = out["e_pot"] + out["e_kin"]
    assert abs(e_tot[-1] - e_tot[0]) < 1e-3
