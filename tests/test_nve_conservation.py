"""Trajectory-level MD validation (VERDICT r2 item 3): velocity-Verlet NVE
runs with a SchNet potential must conserve total energy — the observable
the whole force path (one-reverse-pass autodiff forces, fused kernels,
ASE-style calculator) exists for. Reference counterpart: the fork's MD
usage ``kgcnn/moldyn/ase_calc.py:75`` (which never validates this).

Calibration (CPU, this exact system, see tools/nve_drift_tpu.py for the
chip + fused-kernel variants): f64 rel drift ~1.7e-6 over 5000 steps (the
dt^2 integrator floor), f32 ~2.1e-5 with no secular slope (~3e-9/step).
Bounds below carry ~10x margin."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gcnn_keras_tpu.batch import batch_graphs
from gcnn_keras_tpu.graph.preprocess import set_range
from gcnn_keras_tpu.models import schnet
from gcnn_keras_tpu.moldyn.integrate import (
    make_energy_force_fn, nve_drift, velocity_verlet)

_MASS = np.array([0, 1.0, 0, 0, 0, 0, 12.0, 14.0, 16.0, 19.0])


def _system(n=16, seed=0):
    rs = np.random.RandomState(seed)
    grid = np.stack(np.meshgrid(*[np.arange(4) * 1.6] * 2, [0.0, 1.6]),
                    -1).reshape(-1, 3)[:n]
    pos = (grid + rs.randn(n, 3) * 0.05).astype(np.float32)
    z = rs.choice([1, 6, 8], size=n)
    g = {"node_number": z, "node_coordinates": pos}
    # cutoff with margin: the tethered motion never changes the edge list
    g = set_range(g, max_distance=6.0, max_neighbours=25)
    g["edge_indices"] = g.pop("range_indices")
    return batch_graphs([g]), rs


def _model():
    return schnet.make_model(
        depth=2, interaction_args={"units": 32},
        gauss_args={"bins": 16, "distance_max": 6.0, "sigma": 0.4},
        last_mlp={"units": [32, 16],
                  "activation": ["shifted_softplus"] * 2},
        output_mlp={"units": [16, 1],
                    "activation": ["shifted_softplus", "linear"]})


def _tethered(base_fn, pos0, k=0.5):
    """Model PES + harmonic tether to the start configuration, keeping the
    motion bounded so the trajectory keeps sampling curved regions of the
    PES (free flight would conserve trivially)."""

    def ef(p):
        e, f = base_fn(p)
        d = p - pos0
        return e + 0.5 * k * jnp.sum(d * d), f - k * d

    return ef


def _run(dtype, steps=5000, dt=0.01, seed=0):
    batch, rs = _system(seed=seed)
    model = _model()
    variables = model.init(jax.random.PRNGKey(0), batch)
    if dtype == jnp.float64:
        batch = jax.tree.map(
            lambda x: jnp.asarray(np.asarray(x), jnp.float64)
            if jnp.issubdtype(x.dtype, jnp.floating) else x, batch)
        variables = jax.tree.map(
            lambda x: jnp.asarray(np.asarray(x), jnp.float64), variables)
    pos0 = batch.nodes["node_coordinates"]
    ef = _tethered(make_energy_force_fn(model, variables, batch), pos0)
    masses = jnp.asarray(
        _MASS[np.clip(np.asarray(batch.nodes["node_number"]).astype(int),
                      0, 9)].astype(np.asarray(pos0).dtype))
    masses = jnp.where(batch.node_mask, masses, 1.0)
    vel0 = jnp.asarray((rs.randn(batch.n_node, 3) * 0.02)
                       .astype(np.asarray(pos0).dtype))
    traj = velocity_verlet(ef, pos0, vel0, masses, dt, steps,
                           node_mask=batch.node_mask)
    return traj, nve_drift(traj)


def test_nve_f32_conserves_energy_5000_steps():
    _, m = _run(jnp.float32)
    # bounded oscillation, no secular leak: a broken force path (forces not
    # the exact -dE/dR of the integrated energy) shows up as a slope orders
    # of magnitude above this
    assert m["rel_drift"] < 2e-4, m
    assert m["rel_drift_per_step"] < 1e-7, m


def test_nve_f64_oracle_hits_integrator_floor():
    with jax.enable_x64():
        _, m = _run(jnp.float64)
    assert m["rel_drift"] < 2e-5, m
    assert m["rel_drift_per_step"] < 1e-9, m


def test_nve_f32_tracks_f64_oracle_short_horizon():
    """The f32 trajectory's potential-energy series must follow the f64
    oracle before chaotic divergence sets in."""
    traj32, _ = _run(jnp.float32, steps=500)
    with jax.enable_x64():
        traj64, _ = _run(jnp.float64, steps=500)
    e32 = np.asarray(traj32["e_pot"])
    e64 = np.asarray(traj64["e_pot"])
    assert np.max(np.abs(e32 - e64)) < 1e-5, np.max(np.abs(e32 - e64))
