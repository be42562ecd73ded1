"""NVE molecular-dynamics integration on the device — velocity Verlet under
``jax.lax.scan``, entirely jitted (positions never leave the chip between
steps).

The reference drives MD through ASE's Python-loop integrators
(``kgcnn/moldyn/ase_calc.py:75`` feeds forces into ``ase.md.verlet``); here
the integrator itself is a compiled scan over a fixed graph topology, which
is both the TPU-native design (no host round-trip per step) and the
instrument for the framework's MD *observable*: total-energy drift over an
NVE trajectory, the quantity that validates force consistency (F = -dE/dR
to integration accuracy) for every kernel variant (fused/unfused, f32/f64).
See tests/test_nve_conservation.py and tools/nve_drift_tpu.py.

Topology is FIXED over a trajectory segment (neighbor list from the initial
configuration with a cutoff margin); for long runs re-neighboring happens
between scanned segments — same bucketed-recompile strategy as
``moldyn/base.py``.
"""
from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..batch import GraphBatch

Array = jax.Array


def make_energy_force_fn(model, variables, batch: GraphBatch,
                         energy_key: str = "output") -> Callable:
    """``fn(pos (N,3)) -> (e_pot scalar, forces (N,3))`` for a fixed-topology
    GraphBatch holding ONE molecule in graph slot 0. One reverse pass
    (energies are per-graph scalars, so ``grad(E)`` yields every force —
    the sum-of-energies trick replacing the reference's batch_jacobian,
    ``kgcnn/model/force.py:176``)."""

    def energy(pos):
        out = model.apply(variables, batch.replace_nodes(node_coordinates=pos))
        return out[energy_key][0, 0]

    def fn(pos):
        e, g = jax.value_and_grad(energy)(pos)
        return e, -g

    return fn


def velocity_verlet(energy_force_fn: Callable, pos0: Array, vel0: Array,
                    masses: Array, dt: float, steps: int,
                    node_mask: Optional[Array] = None) -> Dict[str, Array]:
    """Jitted NVE velocity-Verlet trajectory.

    Returns per-step series ``e_pot``, ``e_kin`` (shape (steps,)) plus the
    final ``pos``/``vel``. ``masses``: (N,) — padding atoms get mass 1 and
    zero velocity/force via ``node_mask``.
    """
    m = masses[:, None].astype(pos0.dtype)
    mask = (node_mask[:, None].astype(pos0.dtype)
            if node_mask is not None else jnp.ones_like(m))

    def kinetic(vel):
        return 0.5 * jnp.sum(m * mask * vel * vel)

    def step(carry, _):
        pos, vel, force = carry
        vel_half = vel + 0.5 * dt * force / m
        pos_new = pos + dt * vel_half * mask
        e_pot, force_new = energy_force_fn(pos_new)
        force_new = force_new * mask
        vel_new = vel_half + 0.5 * dt * force_new / m
        return (pos_new, vel_new, force_new), (e_pot, kinetic(vel_new))

    @jax.jit
    def run(pos, vel):
        e0, f0 = energy_force_fn(pos)
        (pos_f, vel_f, _), (e_pot, e_kin) = jax.lax.scan(
            step, (pos, vel, f0 * mask), None, length=steps)
        return pos_f, vel_f, e_pot, e_kin, e0, kinetic(vel)

    pos_f, vel_f, e_pot, e_kin, e0, k0 = run(pos0, vel0 * mask)
    return {"pos": pos_f, "vel": vel_f, "e_pot": e_pot, "e_kin": e_kin,
            "e_pot0": e0, "e_kin0": k0}


def nve_drift(traj: Dict[str, Array]) -> Dict[str, float]:
    """Energy-conservation metrics of a velocity-Verlet trajectory.

    - ``max_abs_drift``: max |E_tot(t) - E_tot(0)|
    - ``rel_drift``: that, normalized by the mean kinetic energy (the
      natural energy scale of the motion)
    - ``drift_per_step``: linear-fit slope of E_tot (systematic drift,
      distinguishing secular energy leaks — wrong forces — from the bounded
      sympletic oscillation velocity Verlet is allowed)
    """
    e_tot = np.asarray(traj["e_pot"]) + np.asarray(traj["e_kin"])
    e_ref = float(traj["e_pot0"]) + float(traj["e_kin0"])
    scale = max(float(np.mean(np.asarray(traj["e_kin"]))), 1e-30)
    t = np.arange(len(e_tot), dtype=np.float64)
    slope = float(np.polyfit(t, np.asarray(e_tot, np.float64), 1)[0])
    max_abs = float(np.max(np.abs(e_tot - e_ref)))
    return {"max_abs_drift": max_abs,
            "rel_drift": max_abs / scale,
            "drift_per_step": slope,
            "rel_drift_per_step": abs(slope) / scale,
            "e_kin_mean": scale}

def langevin_baoab(energy_force_fn: Callable, pos0: Array, vel0: Array,
                   masses: Array, dt: float, steps: int, kT: float,
                   friction: float, rng: Array,
                   node_mask: Optional[Array] = None) -> Dict[str, Array]:
    """Jitted NVT Langevin trajectory (BAOAB splitting, Leimkuhler-
    Matthews), entirely inside one ``lax.scan``.

    The reference gets thermostats from ASE's python-loop integrators
    (``kgcnn/moldyn/ase_calc.py`` plugs the model into ``ase.md``); here the
    thermostat lives on-device next to the potential. BAOAB: B (half kick) -
    A (half drift) - O (Ornstein-Uhlenbeck velocity refresh, exact for the
    OU process) - A - B; superconvergent configurational sampling at large
    dt. ``kT`` is in MODEL ENERGY UNITS, ``friction`` in inverse time units
    of ``dt`` — the caller owns unit consistency (e.g. ASE units: eV, A,
    amu, internal time unit 10.1805 fs).
    """
    m = masses[:, None].astype(pos0.dtype)
    mask = (node_mask[:, None].astype(pos0.dtype)
            if node_mask is not None else jnp.ones_like(m))
    c1 = jnp.asarray(np.exp(-friction * dt), pos0.dtype)
    c2 = jnp.sqrt((1.0 - c1 * c1) * kT)

    def kinetic(vel):
        return 0.5 * jnp.sum(m * mask * vel * vel)

    def step(carry, key):
        pos, vel, force = carry
        vel = vel + 0.5 * dt * force / m                      # B
        pos = pos + 0.5 * dt * vel * mask                     # A
        xi = jax.random.normal(key, pos.shape, pos.dtype)
        vel = (c1 * vel + c2 / jnp.sqrt(m) * xi) * mask       # O
        pos = pos + 0.5 * dt * vel * mask                     # A
        e_pot, force_new = energy_force_fn(pos)
        force_new = force_new * mask
        vel = vel + 0.5 * dt * force_new / m                  # B
        return (pos, vel, force_new), (e_pot, kinetic(vel))

    @jax.jit
    def run(pos, vel, rng):
        e0, f0 = energy_force_fn(pos)
        keys = jax.random.split(rng, steps)
        (pos_f, vel_f, _), (e_pot, e_kin) = jax.lax.scan(
            step, (pos, vel, f0 * mask), keys)
        return pos_f, vel_f, e_pot, e_kin, e0, kinetic(vel)

    pos_f, vel_f, e_pot, e_kin, e0, k0 = run(pos0, vel0 * mask, rng)
    return {"pos": pos_f, "vel": vel_f, "e_pot": e_pot, "e_kin": e_kin,
            "e_pot0": e0, "e_kin0": k0}
